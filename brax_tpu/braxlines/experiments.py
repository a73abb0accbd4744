"""Sweep / experiment infrastructure for braxlines-style studies.

Grid-expands a config (dict values that are lists become sweep axes, nested
dicts flatten to dotted keys), runs each point serially through a trainer's
`progress_fn` seam into an incremental CSV, then aggregates seed groups into
mean/std curves and plots them.

Redesign of the reference's experiment stack:
  - grid expansion + compressed run names:
    /root/reference/brax/experimental/braxlines/common/config_utils.py
  - incremental CSV tabulation:
    /root/reference/brax/experimental/braxlines/common/logger_utils.py:90-347
  - serial runner / load / merge-statistics / plotting:
    /root/reference/brax/experimental/braxlines/experiments/__init__.py:36-371
The reference threads count/index arithmetic through nested configs; here a
config expands eagerly to (name, config) pairs, and seed-merging is a pure
function over loaded curves.
"""

from __future__ import annotations

import csv
import itertools
import json
import os
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from brax_tpu.io import file as io_file

# ------------------------- grid expansion ---------------------------


def _flatten(d: Dict[str, Any], prefix: str = ""):
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            yield from _flatten(v, key + ".")
        else:
            yield key, v


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split(".")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def _short(key: str) -> str:
    """Compressed axis name, e.g. 'env_params.num_legs' -> 'ep.nl'
    (parity: config_utils.get_compressed_name_from_keys)."""
    return ".".join(
        "".join(t[0] for t in part.split("_") if t) for part in key.split(".")
    )


def expand_grid(config) -> List[Tuple[str, Dict[str, Any]]]:
    """Expands a sweep config into (run_name, concrete_config) pairs.

    `config` is a dict (or list of dicts, concatenated): LIST values are
    sweep axes (tuples stay literal values, e.g. obs_indices=(0,)), nested
    dicts flatten to dotted keys.  Run names compress the swept keys only:
    ``ep.nl_4__s_0``.
    """
    if isinstance(config, (list, tuple)):
        return [run for c in config for run in expand_grid(c)]
    flat = dict(_flatten(config))
    axes = [(k, v) for k, v in flat.items() if isinstance(v, list)]
    fixed = {k: v for k, v in flat.items() if not isinstance(v, list)}
    runs = []
    for combo in itertools.product(*[v for _, v in axes]) if axes else [()]:
        cfg = dict(fixed)
        cfg.update({k: val for (k, _), val in zip(axes, combo)})
        name = "__".join(
            f"{_short(k)}_{val}" for (k, _), val in zip(axes, combo)
        ) or "run"
        runs.append((name, _unflatten(cfg)))
    return runs


# ------------------------- csv tabulation ---------------------------


class CsvLogger:
    """Appends metric rows to a CSV incrementally (crash-safe: one flush per
    row).  The header is fixed by the first row; trainers emit a stable
    metric dict per progress call, so later keys never change."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._file = open(path, "w", newline="")
        self._writer: Optional[csv.DictWriter] = None

    def log(self, **row):
        row = {k: _scalar(v) for k, v in row.items()}
        if self._writer is None:
            self._writer = csv.DictWriter(self._file, fieldnames=list(row))
            self._writer.writeheader()
        self._writer.writerow(
            {k: row.get(k, "") for k in self._writer.fieldnames}
        )
        self._file.flush()

    def close(self):
        self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _scalar(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


def parse_csv(path: str) -> Dict[str, np.ndarray]:
    """Loads a training-curve CSV back into {metric: array} (parity:
    logger_utils.parse_csv)."""
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    out: Dict[str, np.ndarray] = {}
    if not rows:
        return out
    for k in rows[0]:
        col = [r[k] for r in rows]
        try:
            out[k] = np.array([float(x) if x != "" else np.nan for x in col])
        except ValueError:
            out[k] = np.array(col)
    return out


# --------------------------- sweep runner ---------------------------


def run_sweep(
    train_fn: Callable[..., Any],
    config,
    output_path: str,
    ignore_errors: bool = False,
) -> List[str]:
    """Runs every grid point serially (parity: experiments.run_experiment).

    ``train_fn(cfg, progress_fn, output_dir)`` trains one configuration and
    reports metrics through ``progress_fn(step, metrics_dict)``; each run
    gets ``<output_path>/<run_name>/`` with ``config.json`` +
    ``training_curves.csv``.  Returns the run directories.
    """
    runs = expand_grid(config)
    run_dirs = []
    for i, (name, cfg) in enumerate(runs):
        out_dir = os.path.join(output_path, name)
        os.makedirs(out_dir, exist_ok=True)
        with io_file.File(os.path.join(out_dir, "config.json"), "w") as f:
            f.write(json.dumps(cfg, indent=2, default=str))
        print(f"[{i + 1}/{len(runs)}] {name}", flush=True)
        with CsvLogger(os.path.join(out_dir, "training_curves.csv")) as log:

            def progress(step, metrics, _log=log):
                _log.log(step=step, **metrics)

            try:
                train_fn(cfg, progress_fn=progress, output_dir=out_dir)
            except Exception as e:  # noqa: BLE001
                if not ignore_errors:
                    raise
                print(f"  FAILED {type(e).__name__}: {e}", flush=True)
        run_dirs.append(out_dir)
    return run_dirs


def load_sweep(output_path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """{run_name: {metric: array}} for every run under output_path."""
    data = {}
    for name in sorted(os.listdir(output_path)):
        csv_path = os.path.join(output_path, name, "training_curves.csv")
        if os.path.isfile(csv_path):
            data[name] = parse_csv(csv_path)
    return data


# ------------------------- seed aggregation -------------------------


def _split_name(name: str, merge_tags: Sequence[str]):
    """Splits 'ep.nl_4__s_0' into (group='ep.nl_4', merged='s_0')."""
    keep, merged = [], []
    for token in name.split("__"):
        tag = token.rsplit("_", 1)[0]
        (merged if tag in merge_tags else keep).append(token)
    return "__".join(keep) or "all", "__".join(merged)


def aggregate(
    data: Dict[str, Dict[str, np.ndarray]],
    merge_tags: Sequence[str] = ("s", "seed"),
) -> Dict[str, Dict[str, Dict[str, np.ndarray]]]:
    """Merges runs differing only in the merge tags (seeds) into
    {group: {metric: {mean, std}}} (parity: experiments.compute_statistics).
    Curves truncate to the shortest member so partial runs still merge."""
    groups: Dict[str, List[Dict[str, np.ndarray]]] = {}
    for name, curves in data.items():
        group, _ = _split_name(name, merge_tags)
        groups.setdefault(group, []).append(curves)
    stats = {}
    for group, members in groups.items():
        keys = set(members[0])
        for m in members[1:]:
            keys &= set(m)
        out = {}
        for k in sorted(keys):
            n = min(len(m[k]) for m in members)
            stacked = np.stack([np.asarray(m[k][:n], float) for m in members])
            out[k] = {"mean": stacked.mean(0), "std": stacked.std(0)}
        stats[group] = out
    return stats


# ----------------------------- plotting -----------------------------


def plot_sweep(
    stats: Dict[str, Dict[str, Dict[str, np.ndarray]]],
    metrics: Optional[Sequence[str]] = None,
    x_key: str = "step",
    output_path: Optional[str] = None,
    output_name: str = "training_curves",
    max_ncols: int = 4,
):
    """One subplot per metric, one mean±std band per group (parity:
    experiments.plot_curves).  Returns the figure; saves a PNG if
    output_path is given."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    first = next(iter(stats.values()), {})
    if metrics is None:
        metrics = [k for k in first if k != x_key]
    ncols = max(1, min(len(metrics), max_ncols))
    nrows = max(1, -(-len(metrics) // ncols))
    fig, axs = plt.subplots(
        nrows, ncols, figsize=(3.5 * ncols, 3 * nrows), squeeze=False
    )
    for i, metric in enumerate(metrics):
        ax = axs[i // ncols][i % ncols]
        for group, curves in sorted(stats.items()):
            if metric not in curves:
                continue
            y = curves[metric]["mean"]
            s = curves[metric]["std"]
            x = curves.get(x_key, {}).get("mean", np.arange(len(y)))[: len(y)]
            ax.plot(x, y, label=group)
            ax.fill_between(x, y - s, y + s, alpha=0.25)
        ax.set(xlabel=x_key, ylabel=metric)
        if i == 0 and len(stats) > 1:
            ax.legend(fontsize=7)
    fig.tight_layout()
    if output_path:
        os.makedirs(output_path, exist_ok=True)
        fig.savefig(os.path.join(output_path, f"{output_name}.png"), dpi=110)
    return fig
