"""Skill / IRL evaluators: rollouts per skill, diversity metrics, plots.

TPU-idiomatic redesign of the reference's evaluator stack
(/root/reference/brax/experimental/braxlines/{vgcrl,irl_smm,common}/
evaluators.py): every skill rolls out in ONE vmapped episode scan, the
mutual-information estimate is a binned histogram computed on device, and
plots are matplotlib/Agg artifacts.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as onp

from brax_tpu.braxlines.discriminators import IRLDiscriminator, SkillDiscriminator
from brax_tpu.braxlines.wrappers import SkillWrapper


def skill_basis(disc: SkillDiscriminator, num_skills: Optional[int] = None):
    """A deterministic spread of skills: one-hot rows for categorical
    priors, a [-1, 1] linspace grid for continuous ones."""
    if disc.dist_p == "categorical":
        return jnp.eye(disc.z_size)
    n = num_skills or 8
    cols = [
        jnp.linspace(-1.0, 1.0, n) * disc.q_scale
        for _ in range(disc.z_size)
    ]
    return jnp.stack(cols, axis=-1)


def rollout_skills(
    environment,
    disc: SkillDiscriminator,
    policy_fn,
    rng: jax.Array,
    episode_length: int = 128,
    num_skills: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rolls out every skill in parallel (one vmapped scan).

    policy_fn(obs, rng) -> (action, extras) — the trainer's inference fn.
    Returns (zs (Z, z_size), obs (Z, T, obs_size), reward (Z, T)) with obs
    the RAW env observation (no z tail).
    """
    env = SkillWrapper(environment, disc)
    zs = skill_basis(disc, num_skills)
    nz = zs.shape[0]
    obs_size = environment.observation_size

    resets = jax.vmap(env.reset)(jax.random.split(rng, nz))
    # force one fixed skill per row
    resets.info["skill_z"] = zs
    obs0 = jnp.concatenate([resets.obs[:, :obs_size], zs], axis=-1)
    state = resets.replace(obs=obs0)

    def step(carry, _):
        state, key = carry
        key, k = jax.random.split(key)
        act, _ = policy_fn(state.obs, k)
        nstate = jax.vmap(env.step)(state, act)
        return (nstate, key), (nstate.obs[:, :obs_size], nstate.reward)

    (_, _), (obs, reward) = jax.lax.scan(
        step, (state, jax.random.fold_in(rng, 1)), (), length=episode_length
    )
    return zs, jnp.swapaxes(obs, 0, 1), jnp.swapaxes(reward, 0, 1)


def estimate_skill_mi(
    obs: jnp.ndarray, obs_indices: Sequence[int], bins: int = 16
) -> float:
    """Binned mutual information I(skill; s[obs_indices]) in nats.

    obs: (Z, T, obs_size) — skill index is the row.  Parity role:
    reference vgcrl/evaluators.py jit_compute_mi_1d / empowerment metric,
    averaged over the indexed dims.
    """
    nz = obs.shape[0]
    mis = []
    for dim in obs_indices:
        x = obs[:, :, dim]  # (Z, T)
        lo, hi = jnp.min(x), jnp.max(x)
        edges = jnp.linspace(lo, hi + 1e-6, bins + 1)
        b = jnp.clip(jnp.searchsorted(edges, x) - 1, 0, bins - 1)  # (Z, T)
        joint = jax.vmap(
            lambda row: jnp.bincount(row, length=bins)
        )(b).astype(jnp.float32)
        joint = joint / jnp.sum(joint)
        pz = jnp.sum(joint, axis=1, keepdims=True)
        pb = jnp.sum(joint, axis=0, keepdims=True)
        ratio = jnp.where(joint > 0, joint / (pz * pb + 1e-12), 1.0)
        mis.append(jnp.sum(joint * jnp.log(ratio)))
    mi = float(jnp.mean(jnp.stack(mis)))
    return mi  # upper-bounded by log(nz) for categorical skills


def skill_metrics(
    disc: SkillDiscriminator,
    disc_params,
    zs: jnp.ndarray,
    obs: jnp.ndarray,
    bins: int = 16,
) -> dict:
    """Diversity summary: binned MI, per-skill discriminator reward, and
    the spread of visited indexed-obs means across skills."""
    rewards = jax.vmap(
        lambda o, z: disc.reward(
            disc_params, o, jnp.broadcast_to(z, (o.shape[0],) + z.shape)
        )
    )(obs, zs)  # (Z, T)
    idx = jnp.asarray(disc.obs_indices)
    per_skill_mean = jnp.mean(obs[:, :, idx], axis=1)  # (Z, |idx|)
    return {
        "mi": estimate_skill_mi(obs, tuple(onp.asarray(idx)), bins),
        "disc_reward_mean": float(jnp.mean(rewards)),
        "skill_mean_spread": float(jnp.std(per_skill_mean)),
    }


def visualize_skills(
    zs: jnp.ndarray,
    obs: jnp.ndarray,
    obs_indices: Sequence[int],
    output_path: Optional[str] = None,
    output_name: str = "skills",
):
    """2D scatter of visited states colored by skill (reference
    vgcrl/evaluators.py:243+).  Uses the first two indexed dims (a 1D
    index plots against time)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 4))
    nz = obs.shape[0]
    idx = list(obs_indices)
    for z in range(nz):
        if len(idx) >= 2:
            ax.plot(
                onp.asarray(obs[z, :, idx[0]]),
                onp.asarray(obs[z, :, idx[1]]),
                ".",
                ms=2,
                label=f"z={z}",
            )
            ax.set(xlabel=f"obs[{idx[0]}]", ylabel=f"obs[{idx[1]}]")
        else:
            ax.plot(onp.asarray(obs[z, :, idx[0]]), ".", ms=2, label=f"z={z}")
            ax.set(xlabel="t", ylabel=f"obs[{idx[0]}]")
    ax.legend(fontsize=7)
    fig.tight_layout()
    if output_path:
        import os

        os.makedirs(output_path, exist_ok=True)
        fig.savefig(f"{output_path}/{output_name}.png", dpi=110)
    return fig


# ----------------------------- IRL side -----------------------------


def energy_distance(
    x: jnp.ndarray, y: jnp.ndarray, max_samples: int = 512
) -> float:
    """Energy distance between two state samples (reference
    irl_smm/evaluators.py:64+): 2 E||X-Y|| - E||X-X'|| - E||Y-Y'||."""
    x = x.reshape(-1, x.shape[-1])[:max_samples]
    y = y.reshape(-1, y.shape[-1])[:max_samples]

    def mean_pdist(a, b):
        d = jnp.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
        return jnp.mean(d)

    return float(
        2 * mean_pdist(x, y) - mean_pdist(x, x) - mean_pdist(y, y)
    )


def visualize_disc(
    disc: IRLDiscriminator,
    disc_params,
    target_data: jnp.ndarray,
    policy_data: Optional[jnp.ndarray] = None,
    dims: Tuple[int, int] = (0, 1),
    grid_n: int = 64,
    output_path: Optional[str] = None,
    output_name: str = "disc",
):
    """Discriminator-reward heatmap over a 2D slice of the data space with
    target (and policy) samples overlaid (reference irl_smm/evaluators.py:
    27-61)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    td = onp.asarray(target_data.reshape(-1, target_data.shape[-1]))
    lo = td.min(axis=0) - 0.5
    hi = td.max(axis=0) + 0.5
    gx = onp.linspace(lo[dims[0]], hi[dims[0]], grid_n)
    gy = onp.linspace(lo[dims[1]], hi[dims[1]], grid_n)
    base = onp.tile(td.mean(axis=0), (grid_n * grid_n, 1))
    xx, yy = onp.meshgrid(gx, gy)
    base[:, dims[0]] = xx.ravel()
    base[:, dims[1]] = yy.ravel()
    r = disc.reward(disc_params, jnp.asarray(base)).reshape(grid_n, grid_n)

    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.pcolormesh(gx, gy, onp.asarray(r), shading="auto")
    fig.colorbar(im, ax=ax, label="disc reward")
    ax.plot(td[:, dims[0]], td[:, dims[1]], "w.", ms=2, label="target")
    if policy_data is not None:
        pd = onp.asarray(policy_data.reshape(-1, policy_data.shape[-1]))
        ax.plot(pd[:, dims[0]], pd[:, dims[1]], "r.", ms=2, label="policy")
    ax.legend(fontsize=7)
    ax.set(xlabel=f"data[{dims[0]}]", ylabel=f"data[{dims[1]}]")
    fig.tight_layout()
    if output_path:
        import os

        os.makedirs(output_path, exist_ok=True)
        fig.savefig(f"{output_path}/{output_name}.png", dpi=110)
    return fig
