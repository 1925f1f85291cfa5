"""Models: dense MLP and stochastic policy heads (reference L3 layer)."""
from . import mlp, policy
