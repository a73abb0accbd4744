"""RL beyond rewards: skill discovery (VGCRL/DIAYN) and adversarial IRL
(GAIL/AIRL/FAIRL).  Reference: brax/experimental/braxlines."""

from brax_tpu.braxlines import discriminators, wrappers
from brax_tpu.braxlines.train import train_irl, train_vgcrl
