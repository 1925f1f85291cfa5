"""Algorithm layer: PPO fit step and training driver (reference L4/L5)."""
from . import ppo
from .trainer import Trainer
