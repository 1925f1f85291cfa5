"""Flash-attention kernel (ops/pallas_attn.py) vs the jnp twin.

Mirrors the reference's naive-kernel-beside-cuBLAS duality
(src/mat_mul.cu:83-120): models/attn._mha + causal_episode_mask is the
oracle; the flash kernel must reproduce its forward AND its gradients (the
custom VJP) to float tolerance, across ragged window lengths (tile-size
padding paths) and episode-mask patterns.  On CPU the kernel runs in
Pallas interpret mode — the exact lowering the chip executes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppoc_tpu.models import attn
from ppoc_tpu.ops import pallas_attn


def _case(T, B, H, hd, p_done, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed + T), 4)
    q = jax.random.normal(ks[0], (T, B, H, hd))
    k = jax.random.normal(ks[1], (T, B, H, hd))
    v = jax.random.normal(ks[2], (T, B, H, hd))
    done = jax.random.bernoulli(ks[3], p_done, (T, B))
    return q, k, v, done


@pytest.mark.parametrize("T,B,H,hd,p_done", [
    (12, 3, 2, 8, 0.25),    # shorter than one tile, heavy masking
    (50, 2, 1, 16, 0.1),    # odd length -> padded tile
    (130, 2, 2, 8, 0.05),   # crosses the 128 tile boundary
    (256, 2, 2, 16, 0.3),   # exactly two tiles, many episodes
])
def test_forward_matches_jnp_twin(T, B, H, hd, p_done):
    q, k, v, done = _case(T, B, H, hd, p_done)
    ep = attn.episode_ids(done)
    mask = attn.causal_episode_mask(done)
    ref = attn._mha(q, k, v, mask)
    got = pallas_attn.flash_mha(q, k, v, ep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("T,B,H,hd,p_done", [
    (12, 3, 2, 8, 0.25),
    (130, 2, 2, 8, 0.05),
])
def test_gradients_match_jnp_twin(T, B, H, hd, p_done):
    """The custom VJP (flash backward: per-tile recomputation from the row
    logsumexp) against autodiff through the materialized-mask twin."""
    q, k, v, done = _case(T, B, H, hd, p_done)
    ep = attn.episode_ids(done)
    mask = attn.causal_episode_mask(done)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(attn._mha(q, k, v, mask)))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(pallas_attn.flash_mha(q, k, v, ep)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_apply_seq_backend_pallas_matches_jnp(monkeypatch):
    """The integration point: apply_seq(backend='pallas') equals the jnp
    path for outputs and parameter gradients.  The flash crossover gate is
    lowered so the kernel actually engages at a CPU-testable window."""
    monkeypatch.setattr(attn, "FLASH_MIN_T", 8)
    T, E = 40, 4
    p = attn.init(jax.random.PRNGKey(0), 3, 16, 2, 2, 32, T, (16, 8, 2))
    xs = jax.random.normal(jax.random.PRNGKey(1), (T, E, 3))
    done = jax.random.bernoulli(jax.random.PRNGKey(2), 0.15, (T, E))

    out_j = attn.apply_seq(p, xs, done, "relu", backend="jnp")
    out_f = attn.apply_seq(p, xs, done, "relu", backend="pallas")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_j),
                               atol=1e-5)

    def loss(p, backend):
        return jnp.sum(jnp.square(
            attn.apply_seq(p, xs, done, "relu", backend=backend)))

    gj = jax.grad(lambda p: loss(p, "jnp"))(p)
    gf = jax.grad(lambda p: loss(p, "pallas"))(p)
    for a, b in zip(jax.tree.leaves(gj), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_trainer_pallas_backend_learns_recall():
    """End-to-end: an attention trainer on the flash path solves the recall
    differentiator exactly like the jnp path (tests/test_attn.py)."""
    from ppoc_tpu import PPOConfig
    from ppoc_tpu.algo.trainer import Trainer

    cfg = PPOConfig(env="recall", n_envs=128, rollout_len=6,
                    minibatch_size=192, fits_per_epoch=8, eval_envs=256,
                    eval_len=6, hidden=(32,), seed=1, lr_policy=1e-3,
                    lr_v=1e-3, attn_dim=16, attn_layers=1, attn_heads=2,
                    kernel_backend="pallas")
    tr = Trainer(cfg)
    assert tr.backend == "pallas"
    hist = tr.train(n_epochs=5, log=False)
    assert hist[-1]["R"] > 0.9, hist[-1]["R"]


def test_fully_masked_rows_are_finite():
    """Every query attends at least itself in real traces, but padded tiles
    produce all-invalid rows — they must come back 0, never NaN (the
    exp(NEG-NEG)=1 trap)."""
    T, B, H, hd = 9, 2, 1, 8   # pads to a 16-row tile: 7 dead rows
    q, k, v, done = _case(T, B, H, hd, 0.5)
    ep = attn.episode_ids(done)
    out = pallas_attn.flash_mha(q, k, v, ep)
    assert np.isfinite(np.asarray(out)).all()


def test_bf16_compute_dtype_close_to_f32():
    """compute_dtype=bf16 carries the q/k/v blocks in bf16 with f32
    softmax/accumulation: outputs and (f32) gradients track the f32 oracle
    at bf16 rounding scale, and gradient dtypes stay f32."""
    T, B, H, hd = 130, 2, 2, 8
    q, k, v, done = _case(T, B, H, hd, 0.1)
    ep = attn.episode_ids(done)
    mask = attn.causal_episode_mask(done)
    ref = attn._mha(q, k, v, mask)
    got = pallas_attn.flash_mha(q, k, v, ep, compute_dtype=jnp.bfloat16)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.05)

    gb = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(
        pallas_attn.flash_mha(q, k, v, ep, compute_dtype=jnp.bfloat16))),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(attn._mha(q, k, v, mask))),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gb):
        assert b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=0.1)


def test_apply_seq_bf16_backend_close_to_f32(monkeypatch):
    """backend='bf16' (XLA short-window path and flash long-window path)
    tracks the f32 outputs at bf16 rounding scale."""
    T, E = 40, 4
    p = attn.init(jax.random.PRNGKey(0), 3, 16, 2, 2, 32, T, (16, 8, 2))
    xs = jax.random.normal(jax.random.PRNGKey(1), (T, E, 3))
    done = jax.random.bernoulli(jax.random.PRNGKey(2), 0.15, (T, E))
    out_j = attn.apply_seq(p, xs, done, "relu", backend="jnp")
    out_b = attn.apply_seq(p, xs, done, "relu", backend="bf16")
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_j),
                               atol=0.05)
    monkeypatch.setattr(attn, "FLASH_MIN_T", 8)  # engage the bf16 flash path
    out_bf = attn.apply_seq(p, xs, done, "relu", backend="bf16")
    np.testing.assert_allclose(np.asarray(out_bf), np.asarray(out_j),
                               atol=0.05)


def test_bf16_sites_bisect_knob(monkeypatch):
    """BF16_SITES (the long-context precision bisect knob): the default is
    the full set; removing every site makes the bf16 backend reproduce the
    f32 forward EXACTLY; removing only 'scores' leaves the Q.K product in
    f32 (output changes vs full-bf16, still close to f32); under the
    bisected flash regime the path falls back to the site-gated XLA core."""
    T, E = 40, 4
    p = attn.init(jax.random.PRNGKey(0), 3, 16, 2, 2, 32, T, (16, 8, 2))
    xs = jax.random.normal(jax.random.PRNGKey(1), (T, E, 3))
    done = jax.random.bernoulli(jax.random.PRNGKey(2), 0.15, (T, E))
    out_j = attn.apply_seq(p, xs, done, "relu", backend="jnp")
    out_b = attn.apply_seq(p, xs, done, "relu", backend="bf16")

    assert attn.BF16_SITES == frozenset(
        {"embed", "qkv", "scores", "av", "out", "ff", "head"})
    monkeypatch.setattr(attn, "BF16_SITES", frozenset())
    out_none = attn.apply_seq(p, xs, done, "relu", backend="bf16")
    np.testing.assert_array_equal(np.asarray(out_none), np.asarray(out_j))

    monkeypatch.setattr(attn, "BF16_SITES", attn.BF16_SITES | frozenset(
        {"embed", "qkv", "av", "out", "ff", "head"}))
    out_noscores = attn.apply_seq(p, xs, done, "relu", backend="bf16")
    assert not np.array_equal(np.asarray(out_noscores), np.asarray(out_b))
    np.testing.assert_allclose(np.asarray(out_noscores), np.asarray(out_j),
                               atol=0.05)
    # bisected flash regime: scores promoted -> the XLA core runs even at
    # T >= FLASH_MIN_T (flash carries one compute dtype for both products)
    monkeypatch.setattr(attn, "FLASH_MIN_T", 8)
    out_long = attn.apply_seq(p, xs, done, "relu", backend="bf16")
    np.testing.assert_allclose(np.asarray(out_long),
                               np.asarray(out_noscores), atol=1e-6)


@pytest.mark.parametrize("T,B,H,hd,p_done", [
    (1030, 1, 1, 8, 0.02),   # (256, 256) tiles, ragged -> pads to 1280
    (2050, 1, 1, 8, 0.01),   # (512, 512) tiles, ragged -> pads to 2560
])
def test_forward_matches_jnp_twin_large_tiles(T, B, H, hd, p_done):
    """The tile sizes grow with the window (_tiles — grid-cell sequencing
    overhead amortization); the causal key-loop bound and the dkv start
    tile are computed from (qt, kt), so the large-tile regimes need their
    own exactness pins, including ragged windows that pad past T."""
    q, k, v, done = _case(T, B, H, hd, p_done)
    ep = attn.episode_ids(done)
    ref = attn._mha(q, k, v, attn.causal_episode_mask(done))
    got = pallas_attn.flash_mha(q, k, v, ep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_gradients_match_jnp_twin_large_tiles():
    T, B, H, hd = 1030, 1, 1, 8
    q, k, v, done = _case(T, B, H, hd, 0.02, seed=5)
    ep = attn.episode_ids(done)
    mask = attn.causal_episode_mask(done)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(attn._mha(q, k, v, mask)))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(pallas_attn.flash_mha(q, k, v, ep)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)


def test_tile_schedule_caps_at_512():
    """The window-scaled tile schedule tops out at (512, 512): chip-probed
    at T=8192, a 1024-tile rung LOSES (fwd+bwd 477.4 vs 340.7 ms) — the
    T=8192 training/serving regime (docs/RESULTS.md round 5) runs the
    512-tile path, i.e. the same compiled kernel family the exactness
    tests above pin."""
    assert pallas_attn._tiles(512) == (128, 128)
    assert pallas_attn._tiles(1024) == (256, 256)
    assert pallas_attn._tiles(2048) == (512, 512)
    assert pallas_attn._tiles(4096) == (512, 512)
    assert pallas_attn._tiles(8192) == (512, 512)
    assert pallas_attn._tiles(1 << 16) == (512, 512)
