"""Dense MLP: parameters, reference-exact initialization, forward pass.

Equivalent of the reference's ``NeuralNetwork`` (src/neural_network.cu:6-72,
include/neural_network.h:40-53), redesigned as a pure pytree of parameters
plus stateless apply functions:

  * init (src/neural_network.cu:40-51): per layer,
      gain  = sqrt(2) for hidden layers, 1 for the output layer
      std   = gain * sqrt(2 / (fan_in + fan_out))
      W    ~  U(-sqrt(3)*std, +sqrt(3)*std)          shape [fan_in, fan_out]
      b    ~  U(-1/sqrt(fan_in), +1/sqrt(fan_in))
  * forward (src/neural_network.cu:74-105 / :163-190): per layer
    ``x @ W + b`` then the activation; the last layer is linear.

The manual backward pass (src/neural_network.cu:121-231) is not re-coded
here: with the jnp backend XLA differentiates and fuses it; with the pallas
backend the custom VJP in :mod:`ppoc_tpu.ops.pallas_mlp` provides hand-written
forward+backward kernels (the reference's mat_mul.cu parity).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = List[Tuple[jax.Array, jax.Array]]  # [(W, b), ...]

_ACTIVATIONS = {
    "relu": lambda x: jnp.maximum(x, 0.0),
    "tanh": jnp.tanh,
    "none": lambda x: x,
}


def init(key: jax.Array, sizes: Sequence[int]) -> Params:
    """Initialize weights with the reference scheme.

    ``sizes`` is the full layer-size list, e.g. [obs, 128, 128, act]
    (src/main.c:28).
    """
    params: Params = []
    n = len(sizes) - 1
    keys = jax.random.split(key, 2 * n)
    for i in range(n):
        fan_in, fan_out = sizes[i], sizes[i + 1]
        gain = 1.0 if i == n - 1 else jnp.sqrt(2.0)
        std = gain * jnp.sqrt(2.0 / (fan_in + fan_out))
        bound_w = jnp.sqrt(3.0) * std
        bound_b = 1.0 / jnp.sqrt(fan_in)
        w = jax.random.uniform(keys[2 * i], (fan_in, fan_out), jnp.float32, -bound_w, bound_w)
        b = jax.random.uniform(keys[2 * i + 1], (fan_out,), jnp.float32, -bound_b, bound_b)
        params.append((w, b))
    return params


def apply(params: Params, x: jax.Array, activation: str = "relu", backend: str = "jnp") -> jax.Array:
    """Forward pass on a batch ``x`` of shape [..., fan_in].

    Backends: "jnp" (XLA-fused), "pallas" (fused TPU kernels,
    ops/pallas_mlp.py), "tp:<axis>" (tensor-parallel forward on tp-local
    param shards inside shard_map, parallel/tp.py), or "pp:<axis>[:M]"
    (GPipe pipeline forward on the local StageParams inside shard_map,
    parallel/pp.py).
    """
    if backend == "pallas":
        from ppoc_tpu.ops import pallas_mlp

        return pallas_mlp.mlp_forward(params, x, activation)
    if backend.startswith("tp:"):
        from ppoc_tpu.parallel import tp

        return tp.apply_tp(params, x, activation, backend[3:])
    if backend.startswith("pp:"):
        from ppoc_tpu.parallel import pp

        return pp.apply_pp(params, x, activation, backend[3:])
    act = _ACTIVATIONS[activation]
    if backend == "bf16":
        # bf16 MXU matmuls with f32 accumulation and f32 master weights:
        # the TPU-native mixed-precision recipe for the large-batch regime
        # (f32 matmuls run as multi-pass bf16 on the MXU; casting inputs
        # halves the passes and the HBM traffic). Gradients flow in f32
        # through the cast (its VJP is a cast back).
        h = x
        for i, (w, b) in enumerate(params):
            h = jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + b
            if i < len(params) - 1:
                h = act(h)
        return h
    h = x
    for i, (w, b) in enumerate(params):
        h = h @ w + b
        if i < len(params) - 1:
            h = act(h)
    return h
