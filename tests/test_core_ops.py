"""Unit tests for core ray math, encodings, samplers, renderers, losses.

Golden semantics come from the reference formulas (cited per test); the
numpy re-derivations here are written from the math, not the torch code.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from samnerf_tpu.core.contraction import scene_contraction, contract_to_unit
from samnerf_tpu.core.rays import RayBundle, render_weights_from_density
from samnerf_tpu.ops.encodings import hash_encode, hash_grid_scalings, sh_encoding
from samnerf_tpu.ops.samplers import (initial_samples, pdf_samples,
                                      searchsorted_right, spacing_piecewise,
                                      spacing_piecewise_inv)
from samnerf_tpu.ops import rendering as R
from samnerf_tpu.ops import losses as L


def make_bundle(n, seed=0, near=0.05, far=1000.0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rb = RayBundle(
        origins=jnp.asarray(rng.randn(n, 3) * 0.1),
        directions=jnp.asarray(d),
        pixel_area=jnp.ones((n, 1)) * 1e-6,
        camera_indices=jnp.zeros((n, 1), jnp.int32),
    )
    return rb.with_near_far(near, far)


# --- contraction (spatial_distortions.py:42-88) ------------------------------

def test_contraction_identity_inside():
    x = jnp.array([[0.3, -0.2, 0.5], [0.0, 0.0, 0.0]])
    np.testing.assert_allclose(scene_contraction(x), x, atol=1e-6)


def test_contraction_linf_bounds():
    x = jnp.array([[100.0, 0.0, 0.0], [-500.0, 200.0, 1.0], [3.0, 3.0, 3.0]])
    c = scene_contraction(x)
    assert np.all(np.abs(np.asarray(c)) < 2.0)
    # direction preserved for axis-aligned point
    assert c[0, 1] == 0 and c[0, 2] == 0 and c[0, 0] > 1.9


def test_contract_to_unit_range():
    x = jax.random.normal(jax.random.PRNGKey(0), (100, 3)) * 50
    u = contract_to_unit(x)
    assert np.all(np.asarray(u) >= 0) and np.all(np.asarray(u) <= 1)


# --- weights (rays.py:141-163) ------------------------------------------------

def test_render_weights_matches_manual():
    rng = np.random.RandomState(1)
    deltas = rng.rand(4, 8, 1).astype(np.float32) * 0.1
    dens = rng.rand(4, 8, 1).astype(np.float32) * 5
    w = np.asarray(render_weights_from_density(jnp.asarray(deltas), jnp.asarray(dens)))
    dd = deltas * dens
    alphas = 1 - np.exp(-dd)
    trans = np.exp(-np.concatenate([np.zeros((4, 1, 1)), np.cumsum(dd[:, :-1], axis=1)], axis=1))
    np.testing.assert_allclose(w, alphas * trans, rtol=1e-4, atol=1e-5)
    # weights sum <= 1
    assert np.all(w.sum(axis=1) <= 1.0 + 1e-5)


# --- hash encoding (encodings.py:289-349) -------------------------------------

def _numpy_hash_encode(table, positions, scalings, log2_size):
    """int64 numpy port of the reference fallback semantics."""
    T = 1 << log2_size
    L = len(scalings)
    primes = np.array([1, 2654435761, 805459861], dtype=np.int64)
    scaled = positions[:, None, :] * scalings[None, :, None]  # [N,L,3]
    f = np.floor(scaled).astype(np.int64)
    c = f + 1
    off = scaled - f
    out = np.zeros((positions.shape[0], L, table.shape[-1]), np.float64)
    for cz in (0, 1):
        for cy in (0, 1):
            for cx in (0, 1):
                corner = np.stack([ (c if cx else f)[..., 0],
                                    (c if cy else f)[..., 1],
                                    (c if cz else f)[..., 2]], axis=-1)
                h = (corner * primes)
                idx = (h[..., 0] ^ h[..., 1] ^ h[..., 2]) % T
                idx = idx + np.arange(L)[None, :] * T
                w = ((off[..., 0] if cx else 1 - off[..., 0]) *
                     (off[..., 1] if cy else 1 - off[..., 1]) *
                     (off[..., 2] if cz else 1 - off[..., 2]))
                out += table[idx] * w[..., None]
    return out.reshape(positions.shape[0], -1)


def test_hash_encode_matches_int64_reference():
    rng = np.random.RandomState(2)
    L, S, F = 4, 10, 2
    scalings = hash_grid_scalings(L, 16, 128)
    table = rng.randn(L * (1 << S), F).astype(np.float32) * 0.01
    pos = rng.rand(64, 3).astype(np.float32)
    # ours is feature-major [F, L*T] / output channels c = f*L + l
    ours = np.asarray(hash_encode(jnp.asarray(table.T), jnp.asarray(pos),
                                  tuple(scalings.tolist()), S))
    ref = _numpy_hash_encode(table, pos.astype(np.float64), scalings, S)
    ref_fmajor = ref.reshape(-1, L, F).transpose(0, 2, 1).reshape(-1, F * L)
    np.testing.assert_allclose(ours, ref_fmajor, rtol=2e-4, atol=2e-6)


def test_hash_encode_grad_flows():
    L, S, F = 2, 8, 2
    scalings = tuple(hash_grid_scalings(L, 16, 32).tolist())
    table = jnp.ones((F, L * (1 << S))) * 0.01
    pos = jax.random.uniform(jax.random.PRNGKey(0), (16, 3))
    g = jax.grad(lambda t: jnp.sum(hash_encode(t, pos, scalings, S) ** 2))(table)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_hash_encode_custom_vjp_matches_autodiff():
    """The scatter-free backward must equal plain autodiff of the forward."""
    from samnerf_tpu.ops.encodings import (_corner_indices_weights,
                                           _hash_encode_fwd_impl)
    L, S, F = 3, 8, 2
    scalings = tuple(hash_grid_scalings(L, 16, 64).tolist())
    key = jax.random.PRNGKey(1)
    table = jax.random.normal(key, (F, L * (1 << S))) * 0.1
    pos = jax.random.uniform(jax.random.PRNGKey(2), (257, 3))
    cot = jax.random.normal(jax.random.PRNGKey(3), (257, F * L))

    # autodiff through the raw forward impl (uses XLA scatter)
    idx, w = _corner_indices_weights(pos, jnp.asarray(scalings), S)
    g_auto = jax.grad(
        lambda t: jnp.sum(_hash_encode_fwd_impl(t, idx, w) * cot))(table)
    # custom vjp
    g_custom = jax.grad(
        lambda t: jnp.sum(hash_encode(t, pos, scalings, S) * cot))(table)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                               rtol=1e-4, atol=1e-5)


# --- SH encoding ---------------------------------------------------------------

def test_sh_encoding_shape_and_dc():
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    e = sh_encoding(d)
    assert e.shape == (2, 16)
    np.testing.assert_allclose(e[:, 0], 0.28209479, rtol=1e-5)


# --- samplers -------------------------------------------------------------------

def test_searchsorted_right_matches_numpy():
    rng = np.random.RandomState(3)
    a = np.sort(rng.rand(5, 9), axis=-1)
    v = rng.rand(5, 7)
    ours = np.asarray(searchsorted_right(jnp.asarray(a), jnp.asarray(v)))
    ref = np.stack([np.searchsorted(a[i], v[i], side="right") for i in range(5)])
    np.testing.assert_array_equal(ours, ref)


def test_spacing_piecewise_roundtrip():
    x = jnp.linspace(0.05, 1000.0, 100)
    np.testing.assert_allclose(spacing_piecewise_inv(spacing_piecewise(x)), x,
                               rtol=1e-4)


def test_initial_samples_bounds_and_monotone():
    rb = make_bundle(8)
    rs = initial_samples(jax.random.PRNGKey(0), rb, 64)
    starts = np.asarray(rs.starts[..., 0])
    ends = np.asarray(rs.ends[..., 0])
    assert starts.shape == (8, 64)
    assert np.all(ends >= starts)
    assert np.all(starts >= 0.05 - 1e-6) and np.all(ends <= 1000.0 + 1e-3)
    # first half roughly uniform: bin 0 width ~ same order as bin 15
    deterministic = initial_samples(None, rb, 64, stratified=False)
    w0 = float(deterministic.deltas[0, 0, 0])
    w15 = float(deterministic.deltas[0, 15, 0])
    assert 0.5 < w0 / w15 < 2.0


def test_pdf_samples_concentrate():
    rb = make_bundle(4, near=1.0, far=10.0)
    rs = initial_samples(None, rb, 32, stratified=False)
    # put all weight in bins 10..12
    w = np.zeros((4, 32, 1), np.float32)
    w[:, 10:13] = 1.0
    out = pdf_samples(None, rb, rs, jnp.asarray(w), 16, stratified=False)
    s = np.asarray(out.spacing_starts[..., 0])
    lo = np.asarray(rs.spacing_starts[0, 9, 0])
    hi = np.asarray(rs.spacing_ends[0, 13, 0])
    frac_inside = np.mean((s >= lo) & (s <= hi))
    assert frac_inside > 0.9


# --- renderers -------------------------------------------------------------------

def test_render_rgb_last_sample_background():
    w = jnp.zeros((2, 4, 1))
    rgb = jnp.ones((2, 4, 3)) * 0.7
    out = R.render_rgb(rgb, w, background_color="last_sample")
    np.testing.assert_allclose(out, 0.7, rtol=1e-6)  # all bg
    out_black = R.render_rgb(rgb, w, background_color="black")
    np.testing.assert_allclose(out_black, 0.0, atol=1e-6)


def test_render_depth_median():
    rb = make_bundle(1, near=0.0, far=1.0)
    rs = initial_samples(None, rb, 10, stratified=False)
    w = np.zeros((1, 10, 1), np.float32)
    w[0, 7] = 1.0  # all mass at sample 7
    d = R.render_depth_median(jnp.asarray(w), rs)
    expected = float((rs.starts[0, 7, 0] + rs.ends[0, 7, 0]) / 2)
    np.testing.assert_allclose(float(d[0, 0]), expected, rtol=1e-5)


def test_topk_sharpened_weights():
    w = jnp.asarray(np.random.RandomState(0).rand(6, 32, 1).astype(np.float32))
    sw, ids = R.topk_sharpened_weights(w, 16, 10.0)
    assert sw.shape == (6, 16, 1) and ids.shape == (6, 16)
    np.testing.assert_allclose(np.asarray(sw.sum(axis=1)), 1.0, rtol=1e-4)
    # sharpening should make the max dominate
    assert float(sw.max()) > 0.5


# --- losses ----------------------------------------------------------------------

def test_distortion_loss_smaller_for_concentrated():
    rb = make_bundle(2, near=1.0, far=10.0)
    rs = initial_samples(None, rb, 16, stratified=False)
    w_spread = jnp.ones((2, 16, 1)) / 16
    w_conc = np.zeros((2, 16, 1), np.float32)
    w_conc[:, 8] = 1.0
    l_spread = float(L.distortion_loss([w_spread], [rs]))
    l_conc = float(L.distortion_loss([jnp.asarray(w_conc)], [rs]))
    assert l_conc < l_spread


def test_interlevel_loss_zero_when_prop_covers():
    rb = make_bundle(2, near=1.0, far=10.0)
    rs = initial_samples(None, rb, 16, stratified=False)
    w = jnp.ones((2, 16, 1)) / 16
    # identical histograms -> proposal fully covers nerf weights -> loss 0
    val = float(L.interlevel_loss([w, w], [rs, rs]))
    assert val < 1e-6


def test_masked_feature_mse_ignores_nan():
    pred = jnp.ones((4, 8))
    tgt = np.ones((4, 8), np.float32)
    tgt[2] = np.nan
    v = float(L.masked_feature_mse(pred, jnp.asarray(tgt)))
    assert v == 0.0
    tgt[0] = 3.0  # mse 4 on row 0, rows 1,3 zero -> mean over 3 valid rows
    v2 = float(L.masked_feature_mse(pred, jnp.asarray(tgt)))
    np.testing.assert_allclose(v2, 4.0 / 3.0, rtol=1e-6)


def test_lpips_structure_random_weights():
    """LPIPS jax implementation: zero for identical images, positive and
    monotonically increasing with perturbation strength (random weights —
    the env has no pretrained VGG; real weights load via
    metrics.load_lpips_params)."""
    import numpy as np

    from samnerf_tpu.utils import metrics as M

    rng = np.random.RandomState(0)
    convs = []
    cin = 3
    for c in M._VGG_CFG:
        if c == "M":
            continue
        convs.append((rng.randn(3, 3, cin, c).astype(np.float32) * 0.1,
                      np.zeros(c, np.float32)))
        cin = c
    conv_chans = [c for c in M._VGG_CFG if c != "M"]
    taps_c = [conv_chans[i] for i in M._TAPS]
    lins = [np.abs(rng.randn(c, 1).astype(np.float32)) for c in taps_c]
    params = {"convs": convs, "lins": lins}

    img = rng.rand(64, 64, 3).astype(np.float32)
    d0 = float(M.lpips(jnp.asarray(img), jnp.asarray(img), params))
    assert abs(d0) < 1e-6
    noise = rng.randn(64, 64, 3).astype(np.float32)
    d1 = float(M.lpips(jnp.asarray(img),
                       jnp.asarray(np.clip(img + 0.05 * noise, 0, 1)), params))
    d2 = float(M.lpips(jnp.asarray(img),
                       jnp.asarray(np.clip(img + 0.3 * noise, 0, 1)), params))
    assert 0 < d1 < d2


def test_lpips_weight_converter_shapes():
    """convert_lpips_weights maps torchvision vgg16 + lpips lin state dicts
    into the jax param tree (torchvision conv layer indices)."""
    import numpy as np

    from samnerf_tpu.utils import metrics as M

    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [c for c in M._VGG_CFG if c != "M"]
    vgg_sd = {}
    cin = 3
    for idx, c in zip(conv_idx, chans):
        vgg_sd[f"features.{idx}.weight"] = np.zeros((c, cin, 3, 3),
                                                    np.float32)
        vgg_sd[f"features.{idx}.bias"] = np.zeros(c, np.float32)
        cin = c
    taps_c = [chans[i] for i in M._TAPS]
    lin_sd = {f"lin{i}.model.1.weight": np.ones((1, c, 1, 1), np.float32)
              for i, c in enumerate(taps_c)}
    params = M.convert_lpips_weights(vgg_sd, lin_sd)
    assert len(params["convs"]) == 13
    assert params["convs"][0][0].shape == (3, 3, 3, 64)
    assert params["convs"][-1][0].shape == (3, 3, 512, 512)
    assert [l.shape for l in params["lins"]] == [
        (64, 1), (128, 1), (256, 1), (512, 1), (512, 1)]
