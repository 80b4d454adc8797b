"""Pallas fused GRU kernel: numerics vs the scan implementation
(interpreter mode on CPU; on real TPU the same kernel compiles via Mosaic —
exercised by benchmarks/bench_gru.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inpaintnet_tpu.ops import gru_init
from inpaintnet_tpu.ops.gru import gru_layer_apply
from inpaintnet_tpu.ops.gru_pallas import (
    gru_layer_pallas,
    gru_layer_pallas_dma,
    gru_layer_pallas_stream,
)


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_matches_scan(reverse):
    B, T, IN, H = 8, 24, 16, 128
    params = gru_init(jax.random.PRNGKey(0), IN, H, 1, False)[0][0]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (B, H))
    out_ref, hn_ref = gru_layer_apply(params, x, h0, reverse=reverse)
    xw = x @ params["w_ih"] + params["b_ih"]
    out_pl, hn_pl = gru_layer_pallas(
        xw, params["w_hh"], params["b_hh"], h0,
        reverse=reverse, tile_b=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hn_pl), np.asarray(hn_ref), atol=2e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_stream_matches_scan(reverse):
    """The streamed (grid-over-time) kernel — the impl='pallas' default."""
    B, T, IN, H = 8, 24, 16, 128
    params = gru_init(jax.random.PRNGKey(0), IN, H, 1, False)[0][0]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (B, H))
    out_ref, hn_ref = gru_layer_apply(params, x, h0, reverse=reverse)
    xw = x @ params["w_ih"] + params["b_ih"]
    out_pl, hn_pl = gru_layer_pallas_stream(
        xw, params["w_hh"], params["b_hh"], h0,
        reverse=reverse, tile_b=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hn_pl), np.asarray(hn_ref), atol=2e-5)


def test_pallas_stream_mask_and_batch_padding():
    B, T, IN, H = 5, 10, 8, 128  # B=5 forces tile padding
    params = gru_init(jax.random.PRNGKey(3), IN, H, 1, False)[0][0]
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, IN))
    h0 = jnp.zeros((B, H))
    mask = jnp.concatenate([jnp.ones((B, 6)), jnp.zeros((B, T - 6))], axis=1)
    out_ref, hn_ref = gru_layer_apply(params, x, h0, mask=mask)
    xw = x @ params["w_ih"] + params["b_ih"]
    out_pl, hn_pl = gru_layer_pallas_stream(
        xw, params["w_hh"], params["b_hh"], h0, mask, tile_b=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(hn_pl), np.asarray(hn_ref), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_pl)[:, :6], np.asarray(out_ref)[:, :6], atol=2e-5
    )


def test_pallas_dma_large_grid_fenced():
    """The manual-DMA variant deadlocks at large grids on hardware — it
    must refuse them instead of wedging the (single) chip."""
    B, T, H = 16 * 256, 4, 128
    xw = jnp.zeros((B, T, 3 * H))
    w_hh = jnp.zeros((H, 3 * H))
    b_hh = jnp.zeros((3 * H,))
    h0 = jnp.zeros((B, H))
    with pytest.raises(ValueError, match="deadlock"):
        gru_layer_pallas_dma(xw, w_hh, b_hh, h0, tile_b=256)


def test_pallas_mask_and_batch_padding():
    B, T, IN, H = 5, 10, 8, 128  # B=5 forces tile padding
    params = gru_init(jax.random.PRNGKey(3), IN, H, 1, False)[0][0]
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, IN))
    h0 = jnp.zeros((B, H))
    mask = jnp.concatenate([jnp.ones((B, 6)), jnp.zeros((B, T - 6))], axis=1)
    out_ref, hn_ref = gru_layer_apply(params, x, h0, mask=mask)
    xw = x @ params["w_ih"] + params["b_ih"]
    out_pl, hn_pl = gru_layer_pallas(
        xw, params["w_hh"], params["b_hh"], h0, mask,
        tile_b=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(hn_pl), np.asarray(hn_ref), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_pl)[:, :6], np.asarray(out_ref)[:, :6], atol=2e-5
    )


def test_pallas_stream_hn_only():
    """want_ys=False returns (None, h_n) with h_n unchanged."""
    B, T, IN, H = 8, 12, 16, 128
    params = gru_init(jax.random.PRNGKey(5), IN, H, 1, False)[0][0]
    x = jax.random.normal(jax.random.PRNGKey(6), (B, T, IN))
    h0 = jnp.zeros((B, H))
    xw = x @ params["w_ih"] + params["b_ih"]
    _, hn_full = gru_layer_pallas_stream(
        xw, params["w_hh"], params["b_hh"], h0, tile_b=8, interpret=True)
    ys, hn = gru_layer_pallas_stream(
        xw, params["w_hh"], params["b_hh"], h0, tile_b=8, interpret=True,
        want_ys=False)
    assert ys is None
    np.testing.assert_allclose(np.asarray(hn), np.asarray(hn_full), atol=1e-6)
