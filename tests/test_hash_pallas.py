"""Parity-partitioned hash encoding: kernel vs jnp reference, vjp, and
field-continuity properties."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from samnerf_tpu.ops import hash_pallas as hp
from samnerf_tpu.ops.encodings import hash_grid_scalings


def _interp(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))


def _setup(L=4, steps=4, P=1, N=256, seed=0, min_res=4, max_res=64):
    scalings = tuple(hash_grid_scalings(L, min_res, max_res).tolist())
    key = jax.random.PRNGKey(seed)
    table = hp.init_parity_table(key, L, steps, P, scale=0.5)
    pos = jax.random.uniform(jax.random.PRNGKey(seed + 1), (N, 3),
                             minval=0.001, maxval=0.999)
    return scalings, table, pos


def test_kernel_matches_reference(monkeypatch):
    _interp(monkeypatch)
    scalings, table, pos = _setup()
    ref = hp.parity_hash_encode_ref(table, pos, scalings, 4)
    out = hp._fwd_call(
        hp.pack_table(table),
        jnp.zeros((8, pos.shape[0])).at[:3].set(pos.T),
        plan=hp._level_plan(scalings, 4), num_steps=4, num_packed=1,
        num_levels=4, tile=128).T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_kernel_matches_reference_packed2(monkeypatch):
    _interp(monkeypatch)
    scalings, table, pos = _setup(P=2)
    ref = hp.parity_hash_encode_ref(table, pos, scalings, 4)
    out = hp._fwd_call(
        hp.pack_table(table),
        jnp.zeros((8, pos.shape[0])).at[:3].set(pos.T),
        plan=hp._level_plan(scalings, 4), num_steps=4, num_packed=2,
        num_levels=4, tile=128).T
    assert out.shape == (256, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_bwd_kernel_matches_ref_vjp(monkeypatch):
    _interp(monkeypatch)
    scalings, table, pos = _setup(L=3, steps=2, N=384)
    plan = hp._level_plan(scalings, 2)
    g = jax.random.normal(jax.random.PRNGKey(9), (384, 6))
    _, vjp = jax.vjp(
        lambda t: hp.parity_hash_encode_ref(t, pos, scalings, 2), table)
    ref_grad = vjp(g)[0]
    gtab = hp._bwd_call(
        jnp.zeros((8, 384)).at[:3].set(pos.T), g.T, plan=plan, num_steps=2,
        num_packed=1, num_levels=3, tile=128)
    out = np.moveaxis(np.asarray(gtab), 0, -1)    # [gl, 8, steps, 128, 2]
    out = out.swapaxes(1, 2).reshape(3, 2 * 8, 128, 2)
    # the ref vjp rounds cotangents through its bf16 cast; the kernel keeps
    # them fp32, so agreement is only to bf16 resolution
    np.testing.assert_allclose(out, np.asarray(ref_grad),
                               rtol=1e-2, atol=1e-4)


def test_public_op_cpu_path_and_grads():
    """On CPU the public op routes to the reference and its vjp."""
    scalings, table, pos = _setup(L=2, steps=2, N=128)
    out = hp.parity_hash_encode(table, pos, scalings, 2)
    ref = hp.parity_hash_encode_ref(table, pos, scalings, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
    g = jax.grad(lambda t: jnp.sum(
        hp.parity_hash_encode(t, pos, scalings, 2) ** 2))(table)
    assert np.abs(np.asarray(g)).sum() > 0


def test_field_is_continuous_across_cells():
    """Interpolated features must be continuous at cell boundaries (the
    parity partition must not break lattice-point identity)."""
    L, steps = 2, 2
    scalings = (8.0, 16.0)
    table = hp.init_parity_table(jax.random.PRNGKey(0), L, steps, scale=0.5)
    eps = 1e-5
    # points straddling x = 3/8 boundary of the coarse level
    x0 = jnp.asarray([[3.0 / 8 - eps, 0.33, 0.77]])
    x1 = jnp.asarray([[3.0 / 8 + eps, 0.33, 0.77]])
    f0 = hp.parity_hash_encode_ref(table, x0, scalings, steps)
    f1 = hp.parity_hash_encode_ref(table, x1, scalings, steps)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-3)


def test_dense_levels_have_no_collisions():
    """Dense level: distinct lattice points map to distinct table slots."""
    steps = 4
    res = 8   # half grid 6 -> 216 <= 512 entries/class: dense
    assert hp.level_is_dense(res, steps)
    pts = []
    for x in range(res + 1):
        for y in range(res + 1):
            for z in range(res + 1):
                pts.append((x, y, z))
    pts = np.array(pts, np.int64)
    half = res // 2 + 2
    cls = (pts[:, 0] & 1) | ((pts[:, 1] & 1) << 1) | ((pts[:, 2] & 1) << 2)
    idx = (pts[:, 0] >> 1) + half * ((pts[:, 1] >> 1) + half * (pts[:, 2] >> 1))
    key = cls * (steps * 128) + idx
    assert len(np.unique(key)) == len(pts)
    assert idx.max() < steps * 128


def test_weights_sum_to_one():
    """The 8 parity-assigned corner weights partition unity."""
    scalings = (16.0,)
    pos = jax.random.uniform(jax.random.PRNGKey(3), (64, 3))
    s_ids = jnp.arange(8, dtype=jnp.int32)[:, None]
    lo, hi, w = hp._corner_index_math(
        pos[:, 0][None], pos[:, 1][None], pos[:, 2][None], 16.0, True, 10, 4,
        s_ids & 1, (s_ids >> 1) & 1, (s_ids >> 2) & 1)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=0)),
                               np.ones(64), rtol=1e-5)


def test_v2_fwd_matches_reference(monkeypatch):
    """Streaming kernel == jnp reference at mixed dense/hashed levels."""
    _interp(monkeypatch)
    scalings, table, pos = _setup(L=4, steps=8, N=512)
    ref = hp.parity_hash_encode_ref(table, pos, scalings, 8)
    meta, scale = hp._plan_meta(hp._level_plan(scalings, 8), 8, 1)
    out = hp._fwd_call_v2(
        hp.pack_table(table),
        jnp.zeros((8, pos.shape[0])).at[:3].set(pos.T),
        meta, scale, num_steps=8, tile=256)
    out = hp._internal_to_public(out, 1, 4, 512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_v2_fwd_matches_reference_packed2(monkeypatch):
    _interp(monkeypatch)
    scalings, table, pos = _setup(L=3, steps=4, P=2, N=256)
    ref = hp.parity_hash_encode_ref(table, pos, scalings, 4)
    meta, scale = hp._plan_meta(hp._level_plan(scalings, 4), 4, 2)
    out = hp._fwd_call_v2(
        hp.pack_table(table),
        jnp.zeros((8, pos.shape[0])).at[:3].set(pos.T),
        meta, scale, num_steps=4, tile=128)
    out = hp._internal_to_public(out, 2, 3, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_v2_bwd_matches_ref_vjp(monkeypatch):
    _interp(monkeypatch)
    scalings, table, pos = _setup(L=3, steps=2, N=384)
    plan = hp._level_plan(scalings, 2)
    g = jax.random.normal(jax.random.PRNGKey(9), (384, 6))
    _, vjp = jax.vjp(
        lambda t: hp.parity_hash_encode_ref(t, pos, scalings, 2), table)
    ref_grad = vjp(g)[0]
    meta, scale = hp._plan_meta(plan, 2, 1)
    g_int = hp._public_to_internal(g, 1, 3)
    gtab = hp._bwd_call_v2(
        jnp.zeros((8, 384)).at[:3].set(pos.T), g_int, meta, scale,
        pl_rows=3, num_steps=2, tile=128)
    out = np.moveaxis(np.asarray(gtab), 1, -1)    # [gl, 8, steps, 128, 2]
    out = out.swapaxes(1, 2).reshape(3, 2 * 8, 128, 2)
    # the v2 backward rounds cotangent*weight through bf16 before the MXU
    # one-hot matmul (tcnn-equivalent fp16 gradient precision), so
    # agreement with the f32 ref vjp is to bf16 resolution
    np.testing.assert_allclose(out, np.asarray(ref_grad),
                               rtol=1e-2, atol=1e-2)


def test_v2_layout_roundtrip():
    g = jax.random.normal(jax.random.PRNGKey(0), (64, 2 * 2 * 3))
    back = hp._internal_to_public(hp._public_to_internal(g, 2, 3), 2, 3, 64)
    np.testing.assert_allclose(np.asarray(back), np.asarray(g))


def test_use_v2_rule():
    assert not hp._use_v2(32, 12)          # 2^15 levels, 12 tables: v1
    assert hp._use_v2(512, 16)             # 2^19: v2
    assert hp._use_v2(32, 64)              # many packed tables: VMEM blown


def test_q8_ref_matches_dequantized_f32():
    """The q8 jnp reference must equal the f32 reference evaluated on the
    dequantized table (same entries, same weights)."""
    scalings, table, pos = _setup(L=3, steps=4, N=256)
    packed, scales = hp.quantize_parity_table(table)
    out_q8 = hp._parity_hash_encode_q8_ref(packed, scales, pos, scalings, 4)
    # dequantize the master table exactly as the quantizer rounded it
    q = jnp.clip(jnp.round(table / scales[:, None, None, None]), -127, 127)
    deq = q * scales[:, None, None, None]
    # f32 ref casts through bf16; make that cast a no-op by comparing to a
    # direct corner-math evaluation instead
    plan = hp._level_plan(scalings, 4)
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    s_ids = jnp.arange(8, dtype=jnp.int32)[:, None]
    s0, s1, s2 = s_ids & 1, (s_ids >> 1) & 1, (s_ids >> 2) & 1
    outs = []
    for p in range(1):
        for f in range(2):
            for l, (scale, dense, half) in enumerate(plan):
                lo, hi, w = hp._corner_index_math(
                    x[None], y[None], z[None], scale, dense, half, 4,
                    s0, s1, s2)
                vals = deq[l, hi * 8 + s_ids, lo, f]
                outs.append(jnp.sum(vals * w, axis=0))
    expected = jnp.stack(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(out_q8), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)


def test_q8_kernel_matches_ref(monkeypatch):
    """Interpret-mode q8 Pallas kernel == q8 jnp reference."""
    _interp(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    scalings, table, pos = _setup(L=4, steps=8, N=512)
    packed, scales = hp.quantize_parity_table(table)
    ref = hp._parity_hash_encode_q8_ref(packed, scales, pos, scalings, 8)
    out = hp.parity_hash_encode_q8(packed, scales, pos, scalings, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_q8_quantization_error_bounded():
    """q8 output stays within one quantization step of the f32 path."""
    scalings, table, pos = _setup(L=2, steps=2, N=128)
    f32 = hp.parity_hash_encode(table, pos, scalings, 2)
    packed, scales = hp.quantize_parity_table(table)
    q8 = hp._parity_hash_encode_q8_ref(packed, scales, pos, scalings, 2)
    # trilinear weights sum to 1, so error <= max per-level scale + bf16 eps
    tol = float(jnp.max(scales)) + 2e-2 * float(jnp.max(jnp.abs(f32)))
    assert float(jnp.max(jnp.abs(q8 - f32))) <= tol


def test_q8_encoding_module(monkeypatch):
    """ParityHashEncoding(quantize_serve=True) runs end to end on CPU."""
    from samnerf_tpu.fields.hash_encoding import ParityHashEncoding

    enc = ParityHashEncoding(num_levels=2, min_res=4, max_res=16,
                             log2_hashmap_size=10, quantize_serve=True)
    pos = jax.random.uniform(jax.random.PRNGKey(0), (128, 3))
    params = enc.init(jax.random.PRNGKey(1), pos)
    out = enc.apply(params, pos)
    assert out.shape == (128, 4) and np.isfinite(np.asarray(out)).all()
    # quantized mode must not propagate gradients to the table
    g = jax.grad(lambda p: float(0) + jnp.sum(enc.apply(p, pos) ** 2))(params)
    assert float(jnp.max(jnp.abs(g["params"]["table"]))) == 0.0


def test_morton_mode_kernel_matches_ref(monkeypatch):
    """v2 kernel under hash_fn='morton' == the jnp reference with the same
    hash, including the per-tile slab-skip masks (disjointness means any
    wrongly-skipped slab would zero some output)."""
    _interp(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    scalings, table, pos = _setup(L=3, steps=8, N=512, min_res=8,
                                  max_res=128)
    ref = hp.parity_hash_encode_ref(table, pos, scalings, 8, "morton")
    out = hp.parity_hash_encode(table, pos, scalings, 8, 0, "morton")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # morton and reference hashes genuinely index differently
    ref0 = hp.parity_hash_encode_ref(table, pos, scalings, 8, "reference")
    assert float(jnp.max(jnp.abs(ref - ref0))) > 0


def test_morton_field_is_continuous():
    """Field continuity is a property of parity partitioning, not the
    hash: check no jumps across a cell boundary under morton."""
    scalings = (8.0,)
    table = hp.init_parity_table(jax.random.PRNGKey(0), 1, 2, scale=0.5)
    base = jnp.asarray([[0.5, 0.37, 0.71]])  # x crosses 4/8 boundary
    eps = 1e-5
    lo_p = hp.parity_hash_encode_ref(
        table, base - jnp.asarray([[eps, 0, 0]]), scalings, 2, "morton")
    hi_p = hp.parity_hash_encode_ref(
        table, base + jnp.asarray([[eps, 0, 0]]), scalings, 2, "morton")
    np.testing.assert_allclose(np.asarray(lo_p), np.asarray(hi_p),
                               atol=1e-3)


def test_morton_grads_flow(monkeypatch):
    """custom_vjp under morton: gradients land on touched entries only."""
    scalings, table, pos = _setup(L=2, steps=2, N=128)
    g = jax.grad(lambda t: jnp.sum(
        hp.parity_hash_encode(t, pos, scalings, 2, 0, "morton") ** 2))(table)
    assert float(jnp.max(jnp.abs(g))) > 0


def test_sample_major_flattening_is_order_invariant():
    """The fields flatten [R, S, 3] sample-major before the encode (serve
    coherence; fields/nerfacto_field._flatten_sample_major); the encode is
    pointwise per position, so field outputs must be bit-identical to a
    plain ray-major evaluation."""
    from samnerf_tpu.fields.nerfacto_field import (HashMLPDensityField,
                                                   _flatten_sample_major)

    p = jax.random.uniform(jax.random.PRNGKey(0), (6, 5, 3), minval=-1.5,
                           maxval=1.5)
    flat, unflatten = _flatten_sample_major(p)
    assert flat.shape == (30, 3)
    # round trip restores order exactly
    np.testing.assert_array_equal(np.asarray(unflatten(flat)), np.asarray(p))

    field = HashMLPDensityField(num_levels=2, max_res=32,
                                log2_hashmap_size=8, hidden_dim=8,
                                num_layers=2)
    params = field.init(jax.random.PRNGKey(1), p)
    out = field.apply(params, p)
    # permuting rays permutes outputs identically (pointwise)
    perm = jnp.asarray([3, 1, 5, 0, 4, 2])
    out_perm = field.apply(params, p[perm])
    np.testing.assert_allclose(np.asarray(out_perm), np.asarray(out)[perm],
                               rtol=0, atol=0)


def test_touched_slab_ids_cover_and_pad():
    """Every slab any corner resolves to appears in the list; padding
    repeats the last touched id (consecutive-duplicate skip contract)."""
    scalings, table, pos = _setup(L=3, steps=8, N=512)
    plan = hp._level_plan(scalings, 8)
    slab = 2
    pos_t = jnp.zeros((8, 512)).at[:3].set(pos.T)
    ids = np.asarray(hp._touched_slab_ids(pos_t, plan, 8, 128, slab,
                                          "reference"))
    assert ids.shape == (3 * 4 * 4,)   # flat [levels * tiles * n_slabs]
    ids = ids.reshape(3, 4, 4)
    s_ids = jnp.arange(8, dtype=jnp.int32)[:, None]
    s0, s1, s2 = s_ids & 1, (s_ids >> 1) & 1, (s_ids >> 2) & 1
    for li, (scale, dense, half) in enumerate(plan):
        _, hi, _ = hp._corner_index_math(
            pos[:, 0][None], pos[:, 1][None], pos[:, 2][None], scale, dense,
            half, 8, s0, s1, s2)
        sl = np.asarray(hi >> 1).reshape(8, 4, 128)
        for t in range(4):
            touched = set(np.unique(sl[:, t]))
            listed = ids[li, t]
            assert touched == set(listed.tolist()), (li, t)
            # sorted ascending then padded with the final touched id
            k = len(touched)
            assert list(listed[:k]) == sorted(touched)
            assert all(listed[k:] == listed[k - 1])


def test_v4_fwd_matches_reference(monkeypatch):
    """Prefetch-gather kernel == jnp reference on random AND coherent
    points (coherent tiles exercise the padded/skipped-slab path)."""
    _interp(monkeypatch)
    scalings, table, pos = _setup(L=4, steps=8, N=512)
    plan = hp._level_plan(scalings, 8)
    meta, scale = hp._plan_meta(plan, 8, 1)
    t = np.linspace(0, 1, 512, dtype=np.float32)
    coherent = jnp.asarray(
        np.stack([0.4 + 0.05 * t, 0.5 + 0.04 * np.sin(3 * t),
                  0.45 + 0.05 * t], -1))
    for hf in ("reference", "morton"):
        for pts in (pos, coherent):
            ref = hp.parity_hash_encode_ref(table, pts, scalings, 8, hf)
            pos_t = jnp.zeros((8, 512)).at[:3].set(pts.T)
            ids = hp._touched_slab_ids(pos_t, plan, 8, 128, 2, hf)
            out = hp._fwd_call_v4(hp.pack_table(table), pos_t, meta, scale,
                                  ids, num_steps=8, num_levels=4, tile=128,
                                  hash_fn=hf, slab=2)
            out = hp._internal_to_public(out, 1, 4, 512)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-5, atol=1e-6, err_msg=hf)


def test_v4_q8_public_coherent_matches_ref(monkeypatch):
    """Public q8 op (v4 prefetch-gather) == q8 jnp reference on a
    coherent batch under morton (slabs actually skipped)."""
    _interp(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    scalings, table, _ = _setup(L=3, steps=8, N=256, min_res=8, max_res=128)
    t = np.linspace(0, 1, 256, dtype=np.float32)
    pos = jnp.asarray(np.stack([0.3 + 0.1 * t, 0.6 - 0.05 * t,
                                0.5 + 0.08 * np.sin(4 * t)], -1))
    packed, scales = hp.quantize_parity_table(table)
    for hf in ("reference", "morton"):
        ref = hp._parity_hash_encode_q8_ref(packed, scales, pos, scalings,
                                            8, hf)
        out = hp.parity_hash_encode_q8(packed, scales, pos, scalings, 8,
                                       hash_fn=hf)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6, err_msg=hf)

def test_v4_dead_tile_skip(monkeypatch):
    """Tiles whose points are all dead (live=0) output zeros; live tiles
    (even with some dead points) match the reference exactly."""
    _interp(monkeypatch)
    scalings, table, pos = _setup(L=4, steps=8, N=512)
    plan = hp._level_plan(scalings, 8)
    meta, scale = hp._plan_meta(plan, 8, 1)
    # tiles of 128: tile 1 fully dead, tile 3 fully dead, others mixed
    live = np.ones(512, np.float32)
    live[128:256] = 0.0
    live[384:512] = 0.0
    live[5] = 0.0          # dead point inside live tile 0
    live_j = jnp.asarray(live)
    for hf in ("reference", "morton"):
        ref = hp.parity_hash_encode_ref(table, pos, scalings, 8, hf)
        pos_t = jnp.zeros((8, 512)).at[:3].set(pos.T)
        ids = hp._touched_slab_ids(pos_t, plan, 8, 128, 2, hf, live=live_j)
        ids_np = np.asarray(ids).reshape(4, 4, 4)
        assert (ids_np[:, 1] == -1).all() and (ids_np[:, 3] == -1).all()
        assert (ids_np[:, 0] >= 0).all() and (ids_np[:, 2] >= 0).all()
        out = hp._fwd_call_v4(hp.pack_table(table), pos_t, meta, scale,
                              ids, num_steps=8, num_levels=4, tile=128,
                              hash_fn=hf, slab=2)
        out = np.asarray(hp._internal_to_public(out, 1, 4, 512))
        np.testing.assert_allclose(out[:128], np.asarray(ref)[:128],
                                   rtol=1e-5, atol=1e-6, err_msg=hf)
        np.testing.assert_allclose(out[256:384], np.asarray(ref)[256:384],
                                   rtol=1e-5, atol=1e-6, err_msg=hf)
        assert (out[128:256] == 0).all() and (out[384:] == 0).all()


def test_v4_q8_dead_tile_skip(monkeypatch):
    """q8 public op with live mask: dead tiles zero, live tiles == ref."""
    _interp(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    scalings, table, pos = _setup(L=3, steps=8, N=256, min_res=8,
                                  max_res=128)
    packed, scales = hp.quantize_parity_table(table)
    live = jnp.asarray(np.repeat([1.0, 0.0], 128).astype(np.float32))
    for hf in ("reference", "morton"):
        ref = hp._parity_hash_encode_q8_ref(packed, scales, pos, scalings,
                                            8, hf)
        out = np.asarray(hp.parity_hash_encode_q8(
            packed, scales, pos, scalings, 8, hash_fn=hf,
            live=live[:, None], tile=128))
        np.testing.assert_allclose(out[:128], np.asarray(ref)[:128],
                                   rtol=1e-5, atol=1e-6, err_msg=hf)
        assert (out[128:] == 0).all()


def test_serve_encode_live_module(monkeypatch):
    """ParityHashEncoding(live=...) f32 serve path: dead tiles zeroed,
    live region matches the no-live module output."""
    _interp(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    from samnerf_tpu.fields.hash_encoding import ParityHashEncoding
    enc = ParityHashEncoding(num_levels=3, min_res=8, max_res=64,
                             log2_hashmap_size=13, features_per_level=2,
                             hash_fn="morton")
    pos = jax.random.uniform(jax.random.PRNGKey(3), (256, 3),
                             minval=0.01, maxval=0.99)
    params = enc.init(jax.random.PRNGKey(0), pos)
    base = np.asarray(enc.apply(params, pos))
    # the 256-point batch is a single kernel tile: all-live must match the
    # plain path bit-for-bit, all-dead must come back zeroed
    out_live = np.asarray(enc.apply(params, pos, live=jnp.ones(256)))
    np.testing.assert_allclose(out_live, base, rtol=1e-5, atol=1e-6)
    out_dead = np.asarray(enc.apply(params, pos, live=jnp.zeros(256)))
    assert (out_dead == 0).all()


def test_v4_bwd_matches_ref_vjp(monkeypatch):
    """Touched-chunk backward (bwd v4) == the reference vjp on random AND
    coherent point streams, both hash fns.  V2_BWD_CHUNK is shrunk to 2 so
    the 8-step tables exercise multiple chunk slots, padded repeats, and
    the chunk-skip predicate (a wrongly-skipped chunk would zero its
    gradient rows; disjointness makes any double-count visible too)."""
    _interp(monkeypatch)
    monkeypatch.setattr(hp, "V2_BWD_CHUNK", 2)
    scalings, table, pos = _setup(L=3, steps=8, N=512)
    plan = hp._level_plan(scalings, 8)
    meta, scale = hp._plan_meta(plan, 8, 1)
    t = np.linspace(0, 1, 512, dtype=np.float32)
    coherent = jnp.asarray(
        np.stack([0.4 + 0.05 * t, 0.5 + 0.04 * np.sin(3 * t),
                  0.45 + 0.05 * t], -1))
    g = jax.random.normal(jax.random.PRNGKey(9), (512, 6))
    for hf in ("reference", "morton"):
        for pts in (pos, coherent):
            _, vjp = jax.vjp(
                lambda tab: hp.parity_hash_encode_ref(tab, pts, scalings,
                                                      8, hf), table)
            ref_grad = vjp(g)[0]
            pos_t = jnp.zeros((8, 512)).at[:3].set(pts.T)
            ids = hp._touched_slab_ids(pos_t, plan, 8, 128, 2, hf)
            g_int = hp._public_to_internal(g, 1, 3)
            gtab = hp._bwd_call_v4(pos_t, g_int, meta, scale, ids,
                                   pl_rows=3, num_steps=8, num_levels=3,
                                   tile=128, hash_fn=hf)
            out = np.moveaxis(np.asarray(gtab), 1, -1)
            out = out.swapaxes(1, 2).reshape(3, 8 * 8, 128, 2)
            # bf16 cotangent rounding as in v2 (tcnn-equivalent precision)
            np.testing.assert_allclose(out, np.asarray(ref_grad),
                                       rtol=1e-2, atol=1e-2, err_msg=hf)


def test_coherent_perm_roundtrip_and_locality():
    pos = jax.random.uniform(jax.random.PRNGKey(5), (1024, 3))
    perm, inv = hp.coherent_perm(pos)
    x = jax.random.normal(jax.random.PRNGKey(6), (1024, 4))
    np.testing.assert_array_equal(
        np.asarray(jnp.take(jnp.take(x, perm, axis=0), inv, axis=0)),
        np.asarray(x))
    # sorted stream is spatially coherent: mean nearest-neighbor distance
    # between consecutive sorted points far below the random order's
    ps = np.asarray(jnp.take(pos, perm, axis=0))
    d_sorted = np.linalg.norm(np.diff(ps, axis=0), axis=1).mean()
    d_orig = np.linalg.norm(np.diff(np.asarray(pos), axis=0), axis=1).mean()
    assert d_sorted < 0.5 * d_orig
    # key top bits match the _morton_mix region ordering (x, y, z halves)
    key = np.asarray(hp._coherent_key(pos))
    top3 = (key >> 21) & 0b111
    expect = ((np.asarray(pos)[:, 0] >= 0.5).astype(int) << 2 \
              | (np.asarray(pos)[:, 1] >= 0.5).astype(int) << 1
              | (np.asarray(pos)[:, 2] >= 0.5).astype(int))
    np.testing.assert_array_equal(top3, expect)


def test_sorted_public_op_fwd_and_grad(monkeypatch):
    """parity_hash_encode(sort_points=True) == the unsorted op, value AND
    table gradient, through the interpreted kernels (fwd v2 + bwd v4)."""
    _interp(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(hp, "V2_BWD_CHUNK", 2)
    scalings, table, pos = _setup(L=3, steps=8, N=384, min_res=8,
                                  max_res=128)
    for hf in ("morton", "reference"):
        ref = hp.parity_hash_encode_ref(table, pos, scalings, 8, hf)
        out = hp.parity_hash_encode(table, pos, scalings, 8, 0, hf, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6, err_msg=hf)

        def loss(tab, sort):
            o = hp.parity_hash_encode(tab, pos, scalings, 8, 0, hf, sort)
            return jnp.sum(o ** 2 * jnp.cos(jnp.arange(o.size)
                                            .reshape(o.shape) * 0.1))
        g_sorted = jax.grad(loss)(table, True)
        g_plain = jax.grad(loss)(table, False)
        np.testing.assert_allclose(np.asarray(g_sorted), np.asarray(g_plain),
                                   rtol=1e-2, atol=1e-3, err_msg=hf)


def test_sorted_encoding_module_cpu_fallback():
    """sort_points on a non-TPU backend is a no-op (ref path, grads ok)."""
    from samnerf_tpu.fields.hash_encoding import ParityHashEncoding
    enc = ParityHashEncoding(num_levels=2, min_res=4, max_res=16,
                             log2_hashmap_size=10, hash_fn="morton",
                             sort_points=True)
    pos = jax.random.uniform(jax.random.PRNGKey(0), (130, 3))
    params = enc.init(jax.random.PRNGKey(1), pos)
    out = enc.apply(params, pos)
    assert out.shape == (130, 4) and np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda p: jnp.sum(enc.apply(p, pos) ** 2))(params)
    assert float(jnp.max(jnp.abs(g["params"]["table"]))) > 0


def test_morton_key_width_parse():
    assert hp.morton_key_width("morton") == 4
    assert hp.morton_key_width("morton5") == 5
    assert hp.morton_key_width("morton6") == 6


def test_morton_wide_key_kernel_matches_ref(monkeypatch):
    """v2 kernel under hash_fn='morton6' (wider spatial key) == the jnp
    reference with the same key width; morton6 indexes differently from
    the default 4-bit key; default 'morton' unchanged vs 'morton4'."""
    _interp(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    scalings, table, pos = _setup(L=3, steps=8, N=512, min_res=8,
                                  max_res=128)
    for hf in ("morton5", "morton6"):
        ref = hp.parity_hash_encode_ref(table, pos, scalings, 8, hf)
        out = hp.parity_hash_encode(table, pos, scalings, 8, 0, hf)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6, err_msg=hf)
    r4 = hp.parity_hash_encode_ref(table, pos, scalings, 8, "morton")
    r4b = hp.parity_hash_encode_ref(table, pos, scalings, 8, "morton4")
    np.testing.assert_array_equal(np.asarray(r4), np.asarray(r4b))
    r6 = hp.parity_hash_encode_ref(table, pos, scalings, 8, "morton6")
    assert float(jnp.max(jnp.abs(r6 - r4))) > 0


def test_group_skip_v2_matches_reference(monkeypatch):
    """Per-128-point-group slab skip: multi-group tiles on random AND
    coherent points == the jnp reference (a wrongly-skipped group slab
    would zero some output; disjointness makes double-counts visible)."""
    _interp(monkeypatch)
    monkeypatch.setenv("SAMNERF_GROUP_SKIP", "1")   # dense tiles: opt-in
    scalings, table, pos = _setup(L=4, steps=8, N=512)
    # patch BEFORE _plan_meta: it reads V2_SLAB at call time, and the
    # kernel's slab sweep must agree with the meta's slab count.
    # tile=512 -> 4 groups/tile; V2_SLAB=2 -> n_slabs=4 so skips bite.
    monkeypatch.setattr(hp, "V2_SLAB", 2)
    assert hp._group_skip_enabled(4, 512)
    meta, scale = hp._plan_meta(hp._level_plan(scalings, 8), 8, 1)
    t = np.linspace(0, 1, 512, dtype=np.float32)
    coherent = jnp.asarray(
        np.stack([0.4 + 0.05 * t, 0.5 + 0.04 * np.sin(3 * t),
                  0.45 + 0.05 * t], -1))
    for hf in ("reference", "morton", "morton6"):
        for pts in (pos, coherent):
            ref = hp.parity_hash_encode_ref(table, pts, scalings, 8, hf)
            pos_t = jnp.zeros((8, 512)).at[:3].set(pts.T)
            out = hp._fwd_call_v2(hp.pack_table(table), pos_t, meta, scale,
                                  num_steps=8, tile=512, hash_fn=hf)
            out = hp._internal_to_public(out, 1, 4, 512)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-5, atol=1e-6, err_msg=hf)


def test_group_skip_live_zeroes_dead_groups(monkeypatch):
    """f32 v2 serve path with a live mask: dead 128-point GROUPS output
    zeros, live groups match the reference (dead points excluded from
    group masks; group granularity, finer than the old v4 tile skip)."""
    _interp(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(hp, "V2_SLAB", 2)
    scalings, table, pos = _setup(L=3, steps=8, N=512)
    live = np.ones(512, np.float32)
    live[128:256] = 0.0          # dead group 1 of tile 0 (tile=512)
    live[400] = 0.0              # dead point inside live group 3
    ref = hp.parity_hash_encode_ref(table, pos, scalings, 8, "morton")
    out = np.asarray(hp.parity_hash_encode_serve(
        table, pos, scalings, 8, 512, "morton", live=jnp.asarray(live)))
    assert (out[128:256] == 0).all()
    np.testing.assert_allclose(out[:128], np.asarray(ref)[:128],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[256:400], np.asarray(ref)[256:400],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[401:], np.asarray(ref)[401:],
                               rtol=1e-5, atol=1e-6)


def test_group_skip_q8_matches_ref_and_live(monkeypatch):
    """q8 v2 kernel with group skip: parity vs the q8 reference, and the
    live path zeroes dead groups while leaving live groups exact."""
    _interp(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    scalings, table, pos = _setup(L=3, steps=16, N=512)
    packed, scales = hp.quantize_parity_table(table)
    # q8 steps8 = 8; V2_SLAB=2 -> n_slabs=4 (group skip active at tile 512)
    monkeypatch.setattr(hp, "V2_SLAB", 2)
    for hf in ("morton", "reference"):
        ref = hp._parity_hash_encode_q8_ref(packed, scales, pos, scalings,
                                            16, hf)
        out = hp.parity_hash_encode_q8(packed, scales, pos, scalings, 16,
                                       hash_fn=hf, tile=512)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6, err_msg=hf)
        live = np.ones(512, np.float32)
        live[256:384] = 0.0
        out_l = np.asarray(hp.parity_hash_encode_q8(
            packed, scales, pos, scalings, 16, hash_fn=hf,
            live=jnp.asarray(live), tile=512))
        assert (out_l[256:384] == 0).all(), hf
        np.testing.assert_allclose(out_l[:256], np.asarray(ref)[:256],
                                   rtol=1e-5, atol=1e-6, err_msg=hf)
        np.testing.assert_allclose(out_l[384:], np.asarray(ref)[384:],
                                   rtol=1e-5, atol=1e-6, err_msg=hf)


def test_group_skip_enabled_rule(monkeypatch):
    # default: only live-masked calls use group skip (dense all-live
    # tiles measured slower with it — see _group_skip_enabled docstring)
    assert not hp._group_skip_enabled(8, 8192)
    assert hp._group_skip_enabled(8, 8192, has_live=True)
    assert not hp._group_skip_enabled(1, 8192, has_live=True)   # 1 slab
    assert not hp._group_skip_enabled(64, 8192, has_live=True)  # > 32 bits
    assert not hp._group_skip_enabled(8, 128, has_live=True)    # 1 group
    monkeypatch.setenv("SAMNERF_GROUP_SKIP", "1")   # dense opt-in
    assert hp._group_skip_enabled(8, 8192)
    monkeypatch.setenv("SAMNERF_GROUP_SKIP", "0")   # force-off everywhere
    assert not hp._group_skip_enabled(8, 8192)
    assert not hp._group_skip_enabled(8, 8192, has_live=True)


# --- q4 (int4 serve tables) -----------------------------------------------


def test_q4_ref_matches_dequantized_f32():
    """The q4 jnp reference must equal direct corner math on the
    int4-rounded table (same entries, same weights)."""
    scalings, table, pos = _setup(L=3, steps=4, N=256)
    packed, scales = hp.quantize_parity_table(table, qbits=4)
    out_q4 = hp._parity_hash_encode_q8_ref(packed, scales, pos, scalings, 4,
                                           qbits=4)
    q = jnp.clip(jnp.round(table / scales[:, None, None, None]), -7, 7)
    deq = q * scales[:, None, None, None]
    plan = hp._level_plan(scalings, 4)
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    s_ids = jnp.arange(8, dtype=jnp.int32)[:, None]
    s0, s1, s2 = s_ids & 1, (s_ids >> 1) & 1, (s_ids >> 2) & 1
    outs = []
    for f in range(2):
        for l, (scale, dense, half) in enumerate(plan):
            lo, hi, w = hp._corner_index_math(
                x[None], y[None], z[None], scale, dense, half, 4,
                s0, s1, s2)
            vals = deq[l, hi * 8 + s_ids, lo, f]
            outs.append(jnp.sum(vals * w, axis=0))
    expected = jnp.stack(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(out_q4), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)


def test_q4_kernel_matches_ref(monkeypatch):
    """Interpret-mode q4 Pallas kernel == q4 jnp reference."""
    _interp(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    scalings, table, pos = _setup(L=4, steps=8, N=512)
    packed, scales = hp.quantize_parity_table(table, qbits=4)
    ref = hp._parity_hash_encode_q8_ref(packed, scales, pos, scalings, 8,
                                        qbits=4)
    out = hp.parity_hash_encode_q8(packed, scales, pos, scalings, 8,
                                   qbits=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_q4_kernel_matches_ref_packed_multi(monkeypatch):
    """q4 kernel on a multi-pack (features_per_level=4) pyramid."""
    _interp(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    scalings, table, pos = _setup(L=3, steps=4, P=2, N=256)
    packed, scales = hp.quantize_parity_table(table, qbits=4)
    ref = hp._parity_hash_encode_q8_ref(packed, scales, pos, scalings, 4,
                                        qbits=4)
    out = hp.parity_hash_encode_q8(packed, scales, pos, scalings, 4,
                                   qbits=4)
    assert out.shape == (256, 12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_q4_quantization_error_bounded():
    scalings, table, pos = _setup(L=2, steps=2, N=128)
    f32 = hp.parity_hash_encode(table, pos, scalings, 2)
    packed, scales = hp.quantize_parity_table(table, qbits=4)
    q4 = hp._parity_hash_encode_q8_ref(packed, scales, pos, scalings, 2,
                                       qbits=4)
    tol = float(jnp.max(scales)) + 2e-2 * float(jnp.max(jnp.abs(f32)))
    assert float(jnp.max(jnp.abs(q4 - f32))) <= tol


# --- fused encode + MLP ------------------------------------------------------


def _mlp_params(key, c, h, o):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    w1 = jax.random.normal(k1, (c, h)) * 0.2
    b1 = jax.random.normal(k2, (h,)) * 0.1
    w2 = jax.random.normal(k3, (h, o)) * 0.2
    b2 = jax.random.normal(k4, (o,)) * 0.1
    return w1, b1, w2, b2


@pytest.mark.parametrize("qbits", [8, 4])
def test_qmlp_kernel_single_pyramid(monkeypatch, qbits):
    """Interpret-mode fused encode+MLP == ref encode -> f32 MLP."""
    _interp(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    scalings, table, pos = _setup(L=4, steps=8, N=512)
    packed, scales = hp.quantize_parity_table(table, qbits=qbits)
    w1, b1, w2, b2 = _mlp_params(jax.random.PRNGKey(3), 8, 16, 5)
    enc = hp._parity_hash_encode_q8_ref(packed, scales, pos, scalings, 8,
                                        qbits=qbits)
    expect = jnp.maximum(enc @ w1 + b1, 0.0) @ w2 + b2
    out = hp.parity_hash_encode_qmlp([packed], [scales], pos, [scalings],
                                     8, w1, b1, w2, b2, qbits=qbits)
    assert out.shape == (512, 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_qmlp_kernel_stacked_pyramids(monkeypatch):
    """Two stacked pyramids (different scalings, shared num_steps) fused
    through one MLP — the SAM-field pattern."""
    _interp(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    scalings_a, table_a, pos = _setup(L=3, steps=4, P=2, N=256)
    scalings_b, table_b, _ = _setup(L=3, steps=4, P=2, seed=7,
                                    min_res=8, max_res=128)
    pk_a, sc_a = hp.quantize_parity_table(table_a)
    pk_b, sc_b = hp.quantize_parity_table(table_b)
    enc = jnp.concatenate([
        hp._parity_hash_encode_q8_ref(pk_a, sc_a, pos, scalings_a, 4),
        hp._parity_hash_encode_q8_ref(pk_b, sc_b, pos, scalings_b, 4),
    ], axis=-1)
    w1, b1, w2, b2 = _mlp_params(jax.random.PRNGKey(5), 24, 32, 9)
    expect = jnp.maximum(enc @ w1 + b1, 0.0) @ w2 + b2
    out = hp.parity_hash_encode_qmlp(
        [pk_a, pk_b], [sc_a, sc_b], pos, [scalings_a, scalings_b],
        4, w1, b1, w2, b2)
    assert out.shape == (256, 9)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_qmlp_cpu_fallback():
    """On CPU the fused op routes to ref encode + jnp MLP."""
    scalings, table, pos = _setup(L=2, steps=2, N=128)
    packed, scales = hp.quantize_parity_table(table)
    w1, b1, w2, b2 = _mlp_params(jax.random.PRNGKey(3), 4, 8, 3)
    out = hp.parity_hash_encode_qmlp([packed], [scales], pos, [scalings],
                                     2, w1, b1, w2, b2)
    enc = hp._parity_hash_encode_q8_ref(packed, scales, pos, scalings, 2)
    expect = jnp.maximum(enc @ w1 + b1, 0.0) @ w2 + b2
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("qbits", [8, 4])
def test_optimal_quant_scales_reduce_mse(qbits):
    """On a heavy-tailed table (one outlier per PL row), the MSE-optimal
    clip scale must beat the outlier-dominated max scale."""
    table = hp.init_parity_table(jax.random.PRNGKey(0), 3, 4, 1, scale=0.1)
    table = table.at[:, 0, 0, 0].set(5.0)           # outliers
    qmax = 127 if qbits == 8 else 7
    base = jnp.maximum(jnp.max(jnp.abs(table), axis=(1, 2, 3)), 1e-12) / qmax
    opt = hp.optimal_quant_scales(table, qbits=qbits)

    def mse(s):
        s4 = s[:, None, None, None]
        q = jnp.clip(jnp.round(table / s4), -qmax, qmax)
        return float(jnp.sum((q * s4 - table) ** 2))

    # frac=1.0 is always a candidate, so the search can never lose; at
    # int4 the outlier must get clipped (strict win), at int8 the 127
    # levels absorb it and max-scale stays optimal on this table
    assert mse(opt) <= mse(base)
    if qbits == 4:
        assert mse(opt) < 0.95 * mse(base)
    # and the reference dequant path accepts the override end to end
    scalings = tuple(hash_grid_scalings(3, 4, 64).tolist())
    pk, sc = hp.quantize_parity_table(table, qbits=qbits, scales=opt)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(opt))
    out = hp._parity_hash_encode_q8_ref(pk, sc, jax.random.uniform(
        jax.random.PRNGKey(2), (128, 3)), scalings, 4, qbits=qbits)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("qbits", [8, 4])
def test_baked_tables_match_inline_quantization(qbits):
    """ParityHashEncoding with bake_quantized_tables(optimize=0) params
    must be BIT-IDENTICAL to the inline per-frame quantize path, and the
    MSE-optimized bake must stay close to the f32 encode."""
    from samnerf_tpu.fields.hash_encoding import ParityHashEncoding

    enc = ParityHashEncoding(num_levels=2, min_res=4, max_res=16,
                             log2_hashmap_size=10, quantize_serve=True,
                             quant_bits=qbits)
    pos = jax.random.uniform(jax.random.PRNGKey(0), (256, 3))
    params = enc.init(jax.random.PRNGKey(1), pos)
    inline = enc.apply(params, pos)
    baked0 = hp.bake_quantized_tables(params, optimize=0)
    assert f"qtable{qbits}" in baked0["params"]
    np.testing.assert_array_equal(np.asarray(enc.apply(baked0, pos)),
                                  np.asarray(inline))
    baked = hp.bake_quantized_tables(params, optimize=12)
    out_opt = enc.apply(baked, pos)
    # optimized scales change values but stay within quantization noise
    step = float(jnp.max(jnp.abs(np.asarray(baked["params"]
                                            [f"qscales{qbits}"]))))
    assert float(jnp.max(jnp.abs(out_opt - inline))) <= 16 * step + 1e-6


def test_bake_quantized_tables_walks_nested_pytrees():
    """The bake must find tables at any depth and ignore non-parity
    leaves (XLA HashEncoding tables, MLP kernels)."""
    t = hp.init_parity_table(jax.random.PRNGKey(0), 2, 2, 1)
    tree = {"params": {"fields": {"enc": {"table": t}},
                       "mlp": {"kernel": jnp.zeros((4, 4))},
                       "xla_enc": {"table": jnp.zeros((2, 16, 2))}}}
    baked = hp.bake_quantized_tables(tree, qbits=(8,), optimize=0)
    assert "qtable8" in baked["params"]["fields"]["enc"]
    assert "qscales8" in baked["params"]["fields"]["enc"]
    assert "qtable8" not in baked["params"]["xla_enc"]
    # masters kept for live-mask / training fallbacks
    np.testing.assert_array_equal(
        np.asarray(baked["params"]["fields"]["enc"]["table"]), np.asarray(t))
