"""Renders CURVES_r02 parity evidence: plots + README analysis.

Reads every curve JSON produced by tools/run_curves.py in the given
directory, groups by (agent, env), overlays ours vs the reference trainer
(run on the same chip) vs the reference's published sweep curve for the
same hyperparameters (datasets/ppo_10_million_steps.tar.gz, if present),
and writes curves.png + README.md with a within-seed-variance analysis.

  python tools/plot_curves.py [CURVES_r02]
"""

import collections
import glob
import json
import os
import sys

import numpy as np


def load_published(env, hp):
    """The published sweep entry matching these hyperparameters, if any."""
    import tarfile

    path = "/root/reference/datasets/ppo_10_million_steps.tar.gz"
    if not os.path.exists(path):
        return None
    with tarfile.open(path) as tar:
        member = tar.getmembers()[0]
        data = json.load(tar.extractfile(member))
    match_keys = [
        "reward_scaling", "entropy_cost", "discounting", "unroll_length",
        "batch_size", "num_minibatches",
    ]
    best = None
    for e in data:
        h = e["hyperparams"]
        if h["env"] != env:
            continue
        if all(np.isclose(h.get(k, -1), hp.get(k, -2)) for k in match_keys):
            if best is None or e["reward"][-1] > best["reward"][-1]:
                best = e
    return best


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "CURVES_r02"
    runs = collections.defaultdict(list)
    for path in sorted(glob.glob(os.path.join(out, "*.json"))):
        with open(path) as f:
            c = json.load(f)
        runs[(c["agent"], c["env"])].append(c)
    if not runs:
        print(f"no curves in {out}")
        return

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(
        1, len(runs), figsize=(5 * len(runs), 4), squeeze=False
    )
    lines = [f"# Learning-curve parity (BASELINE configs 2-4)", ""]
    lines += [
        "Both frameworks trained on the SAME TPU chip with the reference's",
        "published hyperparameters (datasets/); `published` is the Google-run",
        "sweep curve for the matching config where one exists.", "",
    ]
    for i, ((agent, env), group) in enumerate(sorted(runs.items())):
        ax = axs[0][i]
        finals = collections.defaultdict(list)
        for c in group:
            style = dict(ours="-C0", ref="--C1")[c["impl"]]
            ax.plot(
                c["env_steps"], c["reward"], style[:-2] , color=style[-2:],
                alpha=0.8, label=f"{c['impl']} s{c['seed']}",
            )
            finals[c["impl"]].append(c["reward"][-1])
        pub = load_published(env, group[0]["hyperparams"]) if agent == "ppo" else None
        if pub:
            ax.plot(pub["env_steps"], pub["reward"], ":", color="C2",
                    label="published")
            finals["published"].append(pub["reward"][-1])
        ax.set(title=f"{agent} {env}", xlabel="env steps", ylabel="eval reward")
        ax.legend(fontsize=7)

        # single-eval finals are noisy for SAC (per-eval return swings
        # thousands on humanoid); report robust per-seed scores too:
        # mean of the last 5 evals and the peak eval
        robust = collections.defaultdict(list)
        peaks = collections.defaultdict(list)
        for c in group:
            robust[c["impl"]].append(float(np.mean(c["reward"][-5:])))
            peaks[c["impl"]].append(float(np.max(c["reward"])))

        lines.append(f"## {agent} {env}")
        for impl, f in sorted(finals.items()):
            extra = ""
            if impl in robust:
                extra = (
                    f"; last-5 mean {np.mean(robust[impl]):.1f}, "
                    f"peak {np.mean(peaks[impl]):.1f}"
                )
            lines.append(
                f"- {impl}: final reward {np.mean(f):.1f} ± {np.std(f):.1f} "
                f"({len(f)} seed{'s' if len(f) != 1 else ''}){extra}"
            )
        if "ours" in finals and ("ref" in finals or "published" in finals):
            use_ref = "ref" in finals
            ours = robust["ours"] if use_ref else finals["ours"]
            other = robust["ref"] if use_ref else finals["published"]
            spread = max(np.std(ours), np.std(other), 1e-9)
            gap = np.mean(ours) - np.mean(other)
            if gap >= 0:
                verdict = "MATCHES OR BEATS reference"
            elif -gap <= max(2 * spread, 0.1 * abs(np.mean(other))):
                verdict = "WITHIN seed variance"
            else:
                verdict = "OUTSIDE seed variance (worse)"
            basis = "last-5-mean" if use_ref else "final"
            lines.append(
                f"- {basis} gap {gap:+.1f} vs seed spread {spread:.1f} "
                f"-> {verdict}"
            )
        lines.append("")

    fig.tight_layout()
    fig.savefig(os.path.join(out, "curves.png"), dpi=120)
    with open(os.path.join(out, "README.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}/curves.png and {out}/README.md")


if __name__ == "__main__":
    main()
