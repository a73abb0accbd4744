"""Discriminators for skill discovery and adversarial imitation.

- `SkillDiscriminator`: p(z) prior + q(z|s) posterior for
  empowerment/mutual-information skill learning (VGCRL family,
  arXiv:2106.01404; DIAYN).  Parity: braxlines/vgcrl/utils.py:43-330.
- `IRLDiscriminator`: binary classifier (target vs policy data) with
  GAIL/AIRL/FAIRL reward transforms (arXiv:1911.02256).  Parity:
  braxlines/irl_smm/utils.py:43-341.

Distributions are written directly (diag-normal / categorical / bernoulli
log-probs) instead of pulling in tensorflow_probability.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen

from brax_tpu.training import networks
from brax_tpu.training.types import PRNGKey

Params = Any


def _normal_log_prob(mean, scale, x):
    var = scale**2
    return jnp.sum(
        -0.5 * ((x - mean) ** 2) / var - jnp.log(scale) - 0.5 * math.log(2 * math.pi),
        axis=-1,
    )


def _bernoulli_log_prob(logits, labels):
    # log p(y) for y in {0,1} under sigmoid(logits)
    return -jnp.logaddexp(0.0, jnp.where(labels > 0.5, -logits, logits))


@dataclasses.dataclass
class SkillDiscriminator:
    """q(z | s[obs_indices]) with a uniform/categorical skill prior.

    Algorithm variants (reference vgcrl/utils.py get_env_and_fn):
      fixed_gcrl: q = indexing, deterministic z      (goal reaching, fixed)
      gcrl:       q = indexing, normal prior         (goal reaching)
      cdiayn:     q = mlp, continuous uniform prior  (continuous DIAYN)
      diayn:      q = mlp, categorical prior         (DIAYN)
    """

    obs_indices: Sequence[int]
    obs_scale: float = 1.0
    z_size: int = 2
    q_fn: str = "mlp"  # 'indexing' | 'mlp'
    dist_q: str = "normal"  # 'normal' | 'categorical'
    dist_p: str = "uniform"  # 'uniform' | 'categorical'
    q_scale: float = 1.0
    hidden: Tuple[int, ...] = (32, 32)
    logits_clip_range: float = 10.0
    nonnegative_reward: bool = True

    def __post_init__(self):
        if self.q_fn == "mlp":
            self._model = networks.MLP(
                layer_sizes=tuple(self.hidden) + (self.z_size,),
                activation=linen.swish,
            )
        else:
            assert len(self.obs_indices) == self.z_size
            self._model = None
        if self.nonnegative_reward and self.dist_q == "normal":
            # offset so rewards >= 0 within ~3 sigma (vgcrl/utils.py:75-80)
            self._ll_offset = -_normal_log_prob(
                jnp.zeros(self.z_size),
                jnp.ones(self.z_size) * self.q_scale,
                jnp.ones(self.z_size) * self.q_scale * 3,
            )
        elif self.nonnegative_reward:
            self._ll_offset = self.logits_clip_range
        else:
            self._ll_offset = 0.0

    def init(self, rng: PRNGKey) -> Params:
        if self._model is None:
            return {"empty": jnp.zeros(())}
        dummy = jnp.zeros((1, len(self.obs_indices)))
        return self._model.init(rng, dummy)

    def sample_p(self, rng: PRNGKey):
        """Samples a skill z from the prior."""
        if self.dist_p == "uniform":
            return jax.random.uniform(
                rng, (self.z_size,), minval=-self.obs_scale, maxval=self.obs_scale
            )
        return jax.nn.one_hot(
            jax.random.randint(rng, (), 0, self.z_size), self.z_size
        )

    def q_params(self, params: Params, obs: jnp.ndarray):
        """Posterior parameters from (unaugmented) observations."""
        indexed = obs[..., jnp.asarray(self.obs_indices)]
        if self._model is None:
            return indexed
        return self._model.apply(params, indexed)

    def ll_q(self, params: Params, obs: jnp.ndarray, z: jnp.ndarray):
        """log q(z | s)."""
        out = self.q_params(params, obs)
        if self.dist_q == "normal":
            return _normal_log_prob(out, self.q_scale, z)
        logits = jnp.clip(out, -self.logits_clip_range, self.logits_clip_range)
        return jnp.sum(jax.nn.log_softmax(logits) * z, axis=-1)

    def reward(self, params: Params, obs: jnp.ndarray, z: jnp.ndarray):
        """Empowerment reward: log q(z|s) (+ offset for nonnegativity)."""
        return self.ll_q(params, obs, z) + self._ll_offset

    def loss(self, params: Params, obs: jnp.ndarray, z: jnp.ndarray):
        """Discriminator update: maximize log q(z|s) on visited states."""
        return -jnp.mean(self.ll_q(params, obs, z))


@dataclasses.dataclass
class IRLDiscriminator:
    """Binary classifier over target vs on-policy data + reward transform."""

    input_size: int
    reward_type: str = "gail"  # 'gail' | 'gail2' | 'airl' | 'fairl'
    arch: Tuple[int, ...] = (32, 32)
    obs_indices: Optional[Sequence[int]] = None
    include_action: bool = False
    logits_clip_range: float = 10.0
    nonnegative_reward: bool = True
    target_data: Optional[jnp.ndarray] = None  # (M, input_size)

    def __post_init__(self):
        self._model = networks.MLP(
            layer_sizes=tuple(self.arch) + (1,), activation=linen.swish
        )

    def init(self, rng: PRNGKey) -> Params:
        return self._model.init(rng, jnp.zeros((1, self.input_size)))

    def obs_act2data(self, obs: jnp.ndarray, act: jnp.ndarray):
        data = obs
        if self.obs_indices is not None:
            data = data[..., jnp.asarray(self.obs_indices)]
        if self.include_action:
            data = jnp.concatenate([data, act], axis=-1)
        return data

    def logits(self, params: Params, data: jnp.ndarray):
        out = self._model.apply(params, data)[..., 0]
        return jnp.clip(out, -self.logits_clip_range, self.logits_clip_range)

    def reward(self, params: Params, data: jnp.ndarray):
        """IRL reward transform of D(s) (irl_smm/utils.py:130-163)."""
        logits = self.logits(params, data)
        if self.reward_type == "gail":
            r = -_bernoulli_log_prob(logits, jnp.zeros_like(logits))
        elif self.reward_type == "gail2":
            r = _bernoulli_log_prob(logits, jnp.ones_like(logits))
            if self.nonnegative_reward:
                r = r + self.logits_clip_range
        elif self.reward_type == "airl":
            r = logits
            if self.nonnegative_reward:
                r = r + self.logits_clip_range
        elif self.reward_type == "fairl":
            r = jnp.exp(logits) * -logits
            if self.nonnegative_reward:
                r = r + self.logits_clip_range
        else:
            raise NotImplementedError(self.reward_type)
        return r

    def loss(self, params: Params, policy_data: jnp.ndarray, rng: PRNGKey):
        """Binary cross-entropy: target=1, policy=0 (balanced by sampling
        an equal number of target rows per batch)."""
        assert self.target_data is not None
        n = policy_data.shape[0]
        idx = jax.random.randint(rng, (n,), 0, self.target_data.shape[0])
        target = self.target_data[idx]
        logits_t = self.logits(params, target)
        logits_p = self.logits(params, policy_data)
        ll = _bernoulli_log_prob(logits_t, jnp.ones_like(logits_t)).mean()
        ll += _bernoulli_log_prob(logits_p, jnp.zeros_like(logits_p)).mean()
        return -ll
