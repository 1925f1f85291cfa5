"""Models: dense MLP, mixture-of-experts trunk, and stochastic policy
heads (reference L3 layer; moe extends beyond the reference scope)."""
from . import mlp, moe, policy
