"""On-device RL training stack (PPO/SAC/ES/ARS/APG)."""
