"""Golden parity tests: flax SAM modules vs the reference torch modules
(random weights, converted with build_sam.convert_torch_state_dict pieces).

The reference's ``modeling/`` subpackage is torch-only, so we import its
files directly (bypassing segment_anything/__init__.py which needs
torchvision).
"""
import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference/samnerf/segment_anything/modeling"


def _load(name, path, package_stubs=()):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    common = _load("ref_common", f"{REF}/common.py")
    sys.modules["ref_modeling"] = type(sys)("ref_modeling")
    # satisfy the relative imports by loading in dependency order under a
    # fake package
    import types
    pkg = types.ModuleType("refsam")
    pkg.__path__ = [REF]
    sys.modules["refsam"] = pkg
    names = ["common", "image_encoder", "prompt_encoder", "transformer",
             "mask_decoder"]
    mods = {}
    for n in names:
        spec = importlib.util.spec_from_file_location(f"refsam.{n}",
                                                      f"{REF}/{n}.py")
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"refsam.{n}"] = m
        spec.loader.exec_module(m)
        mods[n] = m
    return mods


def _prefix_sd(module, prefix):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


def test_image_encoder_parity(ref):
    from samnerf_tpu.perception.sam.build_sam import convert_torch_state_dict
    from samnerf_tpu.perception.sam.image_encoder import ImageEncoderViT

    torch.manual_seed(0)
    t_enc = ref["image_encoder"].ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=40, depth=3, num_heads=2,
        mlp_ratio=2.0, out_chans=24, qkv_bias=True, use_rel_pos=True,
        window_size=3, global_attn_indexes=(1,))
    # randomize params that init to zero (pos_embed, rel_pos)
    with torch.no_grad():
        for n, p in t_enc.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)
    t_enc.eval()

    sd = _prefix_sd(t_enc, "image_encoder")
    params = convert_torch_state_dict(sd, depth=3)["image_encoder"]

    j_enc = ImageEncoderViT(img_size=64, patch_size=16, embed_dim=40, depth=3,
                            num_heads=2, mlp_ratio=2.0, out_chans=24,
                            use_rel_pos=True, window_size=3,
                            global_attn_indexes=(1,))
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = t_enc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_out = j_enc.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out),
                               t_out.numpy().transpose(0, 2, 3, 1),
                               rtol=5e-4, atol=5e-5)


def test_prompt_encoder_parity(ref):
    from samnerf_tpu.perception.sam.build_sam import convert_torch_state_dict
    from samnerf_tpu.perception.sam.prompt_encoder import PromptEncoder

    torch.manual_seed(1)
    t_pe = ref["prompt_encoder"].PromptEncoder(
        embed_dim=32, image_embedding_size=(8, 8),
        input_image_size=(128, 128), mask_in_chans=8)
    t_pe.eval()
    sd = _prefix_sd(t_pe, "prompt_encoder")
    params = convert_torch_state_dict(
        {**sd, "image_encoder.pos_embed": torch.zeros(1, 1, 1, 1),
         "image_encoder.patch_embed.proj.weight": torch.zeros(1, 1, 1, 1),
         "image_encoder.patch_embed.proj.bias": torch.zeros(1),
         "image_encoder.neck.0.weight": torch.zeros(1, 1, 1, 1),
         "image_encoder.neck.1.weight": torch.zeros(1),
         "image_encoder.neck.1.bias": torch.zeros(1),
         "image_encoder.neck.2.weight": torch.zeros(1, 1, 1, 1),
         "image_encoder.neck.3.weight": torch.zeros(1),
         "image_encoder.neck.3.bias": torch.zeros(1),
         **_fake_decoder_sd()}, depth=0)["prompt_encoder"]

    j_pe = PromptEncoder(embed_dim=32, image_embedding_size=(8, 8),
                         input_image_size=(128, 128), mask_in_chans=8)

    pts = np.array([[[10.0, 20.0], [100.0, 40.0], [0.0, 0.0]]], np.float32)
    labs = np.array([[1, 0, -1]], np.int32)
    masks = np.random.RandomState(2).randn(1, 1, 32, 32).astype(np.float32)

    with torch.no_grad():
        t_sparse, t_dense = t_pe(
            points=(torch.from_numpy(pts), torch.from_numpy(labs)),
            boxes=None, masks=torch.from_numpy(masks))
        t_pe_grid = t_pe.get_dense_pe()

    j_sparse, j_dense = j_pe.apply(
        {"params": params},
        points=(jnp.asarray(pts), jnp.asarray(labs)),
        masks=jnp.asarray(masks.transpose(0, 2, 3, 1)))
    j_grid = j_pe.apply({"params": params}, method=PromptEncoder.get_dense_pe)

    np.testing.assert_allclose(np.asarray(j_sparse), t_sparse.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_dense),
                               t_dense.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_grid),
                               t_pe_grid.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def _fake_decoder_sd():
    """Minimal zero tensors so convert_torch_state_dict(depth=0) can run when
    we only care about one sub-tree."""
    sd = {}
    z = torch.zeros
    sd["mask_decoder.iou_token.weight"] = z(1, 4)
    sd["mask_decoder.mask_tokens.weight"] = z(4, 4)
    sd["mask_decoder.output_upscaling.0.weight"] = z(4, 1, 2, 2)
    sd["mask_decoder.output_upscaling.0.bias"] = z(1)
    sd["mask_decoder.output_upscaling.1.weight"] = z(1)
    sd["mask_decoder.output_upscaling.1.bias"] = z(1)
    sd["mask_decoder.output_upscaling.3.weight"] = z(1, 1, 2, 2)
    sd["mask_decoder.output_upscaling.3.bias"] = z(1)
    for i in range(4):
        for j in range(3):
            sd[f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}.weight"] = z(4, 4)
            sd[f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}.bias"] = z(4)
    for j in range(3):
        sd[f"mask_decoder.iou_prediction_head.layers.{j}.weight"] = z(4, 4)
        sd[f"mask_decoder.iou_prediction_head.layers.{j}.bias"] = z(4)
    sd["mask_decoder.transformer.norm_final_attn.weight"] = z(4)
    sd["mask_decoder.transformer.norm_final_attn.bias"] = z(4)
    for name in ("final_attn_token_to_image",):
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"mask_decoder.transformer.{name}.{p}.weight"] = z(4, 4)
            sd[f"mask_decoder.transformer.{name}.{p}.bias"] = z(4)
    for i in range(2):
        b = f"mask_decoder.transformer.layers.{i}"
        for name in ("self_attn", "cross_attn_token_to_image",
                     "cross_attn_image_to_token"):
            for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[f"{b}.{name}.{p}.weight"] = z(4, 4)
                sd[f"{b}.{name}.{p}.bias"] = z(4)
        for p in ("lin1", "lin2"):
            sd[f"{b}.mlp.{p}.weight"] = z(4, 4)
            sd[f"{b}.mlp.{p}.bias"] = z(4)
        for n in range(1, 5):
            sd[f"{b}.norm{n}.weight"] = z(4)
            sd[f"{b}.norm{n}.bias"] = z(4)
    return sd


def _fake_prompt_sd():
    sd = {}
    z = torch.zeros
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = z(2, 2)
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = z(1, 4)
    sd["prompt_encoder.not_a_point_embed.weight"] = z(1, 4)
    sd["prompt_encoder.no_mask_embed.weight"] = z(1, 4)
    sd["prompt_encoder.mask_downscaling.0.weight"] = z(1, 1, 2, 2)
    sd["prompt_encoder.mask_downscaling.0.bias"] = z(1)
    sd["prompt_encoder.mask_downscaling.1.weight"] = z(1)
    sd["prompt_encoder.mask_downscaling.1.bias"] = z(1)
    sd["prompt_encoder.mask_downscaling.3.weight"] = z(1, 1, 2, 2)
    sd["prompt_encoder.mask_downscaling.3.bias"] = z(1)
    sd["prompt_encoder.mask_downscaling.4.weight"] = z(1)
    sd["prompt_encoder.mask_downscaling.4.bias"] = z(1)
    sd["prompt_encoder.mask_downscaling.6.weight"] = z(1, 1, 1, 1)
    sd["prompt_encoder.mask_downscaling.6.bias"] = z(1)
    return sd


def _fake_encoder_sd():
    z = torch.zeros
    return {"image_encoder.pos_embed": z(1, 1, 1, 1),
            "image_encoder.patch_embed.proj.weight": z(1, 1, 1, 1),
            "image_encoder.patch_embed.proj.bias": z(1),
            "image_encoder.neck.0.weight": z(1, 1, 1, 1),
            "image_encoder.neck.1.weight": z(1),
            "image_encoder.neck.1.bias": z(1),
            "image_encoder.neck.2.weight": z(1, 1, 1, 1),
            "image_encoder.neck.3.weight": z(1),
            "image_encoder.neck.3.bias": z(1)}


def test_mask_decoder_parity(ref):
    from samnerf_tpu.perception.sam.build_sam import convert_torch_state_dict
    from samnerf_tpu.perception.sam.mask_decoder import MaskDecoder

    torch.manual_seed(3)
    dim = 64
    rng = np.random.RandomState(4)
    emb = rng.randn(1, 8, 8, dim).astype(np.float32)
    pe = rng.randn(1, 8, 8, dim).astype(np.float32)
    sparse = rng.randn(2, 3, dim).astype(np.float32)
    dense = rng.randn(2, 8, 8, dim).astype(np.float32)

    # our MaskDecoder hardcodes the real SAM transformer (mlp 2048, heads 8)
    j_dec = MaskDecoder(transformer_dim=dim, num_multimask_outputs=3,
                        iou_head_depth=3, iou_head_hidden_dim=dim)
    t_dec2 = ref["mask_decoder"].MaskDecoder(
        transformer_dim=dim,
        transformer=ref["transformer"].TwoWayTransformer(
            depth=2, embedding_dim=dim, mlp_dim=2048, num_heads=8),
        num_multimask_outputs=3, iou_head_depth=3, iou_head_hidden_dim=dim)
    t_dec2.eval()
    sd = {**_prefix_sd(t_dec2, "mask_decoder"), **_fake_encoder_sd(),
          **_fake_prompt_sd()}
    params = convert_torch_state_dict(sd, depth=0)["mask_decoder"]
    with torch.no_grad():
        t_masks, t_iou = t_dec2(
            image_embeddings=torch.from_numpy(emb.transpose(0, 3, 1, 2)),
            image_pe=torch.from_numpy(pe.transpose(0, 3, 1, 2)),
            sparse_prompt_embeddings=torch.from_numpy(sparse),
            dense_prompt_embeddings=torch.from_numpy(dense.transpose(0, 3, 1, 2)),
            multimask_output=True)
    j_masks, j_iou = j_dec.apply(
        {"params": params}, jnp.asarray(emb), jnp.asarray(pe),
        jnp.asarray(sparse), jnp.asarray(dense), True)
    np.testing.assert_allclose(np.asarray(j_masks), t_masks.numpy(),
                               rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_iou), t_iou.numpy(),
                               rtol=5e-4, atol=1e-4)


def test_predictor_set_feature_end_to_end_parity(ref):
    """Full view-time decode path vs the reference: rendered embedding in
    via set_feature, click prompt, mask out (``predictor.py:100-127`` +
    ``:254-281`` + ``sam.py postprocess_masks``), at the real SAM sizes."""
    from samnerf_tpu.perception.sam.build_sam import (build_sam,
                                                      convert_torch_state_dict)
    from samnerf_tpu.perception.sam.predictor import SamPredictor

    torch.manual_seed(3)
    t_pe = ref["prompt_encoder"].PromptEncoder(
        embed_dim=256, image_embedding_size=(64, 64),
        input_image_size=(1024, 1024), mask_in_chans=16)
    t_tr = ref["transformer"].TwoWayTransformer(depth=2, embedding_dim=256,
                                                mlp_dim=2048, num_heads=8)
    t_md = ref["mask_decoder"].MaskDecoder(
        transformer_dim=256, transformer=t_tr, num_multimask_outputs=3,
        iou_head_depth=3, iou_head_hidden_dim=256)
    t_pe.eval(); t_md.eval()

    sd = {**_prefix_sd(t_pe, "prompt_encoder"),
          **_prefix_sd(t_md, "mask_decoder"),
          # encoder params unused on the set_feature path; minimal stubs
          "image_encoder.pos_embed": torch.zeros(1, 1, 1, 1),
          "image_encoder.patch_embed.proj.weight": torch.zeros(1, 1, 1, 1),
          "image_encoder.patch_embed.proj.bias": torch.zeros(1),
          "image_encoder.neck.0.weight": torch.zeros(1, 1, 1, 1),
          "image_encoder.neck.1.weight": torch.zeros(1),
          "image_encoder.neck.1.bias": torch.zeros(1),
          "image_encoder.neck.2.weight": torch.zeros(1, 1, 1, 1),
          "image_encoder.neck.3.weight": torch.zeros(1),
          "image_encoder.neck.3.bias": torch.zeros(1)}
    params = convert_torch_state_dict(sd, depth=0)
    for k in ("pos_embed", "patch_embed", "neck_conv1", "neck_ln1",
              "neck_conv2", "neck_ln2"):
        params["image_encoder"].pop(k, None)

    sam, _ = build_sam("vit_b")
    pred = SamPredictor(sam, {"params": params})

    h, w = 512, 512
    feat = np.random.RandomState(4).randn(64, 64, 256).astype(np.float32)
    pred.set_feature(jnp.asarray(feat), original_image_size=(h, w))
    click = np.array([[200.0, 256.0]])
    ours_masks, ours_iou, ours_low = pred.predict(
        point_coords=click, point_labels=np.array([1]),
        multimask_output=False)

    # reference flow (predictor.py:254-281) on the same inputs
    with torch.no_grad():
        tfeat = torch.from_numpy(feat.transpose(2, 0, 1))[None]  # [1,256,64,64]
        coords = torch.from_numpy(
            (click * (1024.0 / max(h, w))).astype(np.float32))[None]
        labels = torch.from_numpy(np.array([[1]], np.int32))
        sparse, dense = t_pe(points=(coords, labels), boxes=None, masks=None)
        low_res, iou = t_md(
            image_embeddings=tfeat, image_pe=t_pe.get_dense_pe(),
            sparse_prompt_embeddings=sparse, dense_prompt_embeddings=dense,
            multimask_output=False)
        import torch.nn.functional as F
        up = F.interpolate(low_res, (1024, 1024), mode="bilinear",
                           align_corners=False)[..., :1024, :1024]
        ref_masks = F.interpolate(up, (h, w), mode="bilinear",
                                  align_corners=False)[0] > 0.0

    ref_np = ref_masks.numpy()
    inter = np.logical_and(ours_masks, ref_np).sum()
    union = np.logical_or(ours_masks, ref_np).sum()
    miou = inter / max(union, 1)
    # bucket-padded not-a-point tokens are masked out of the decoder
    # attention (num_valid_points), so padding is numerically invisible
    # and the decode matches the reference's dynamic-count path exactly.
    assert miou > 0.999, miou
    np.testing.assert_allclose(ours_iou, iou[0].numpy(), rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(
        ours_low[0], low_res[0, 0].numpy(), rtol=5e-3, atol=5e-3)


def test_bucket_padding_invariance():
    """Decoding n=3 points padded into a 16-bucket (num_valid_points=3)
    must equal decoding the exact 4-token layout (3 + canonical pad).
    Proves static-bucket padding is numerically invisible."""
    from samnerf_tpu.perception.sam.build_sam import build_sam

    sam, _ = build_sam("vit_b")
    feat = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 256))
    coords3 = jnp.asarray([[[100.0, 200.0], [300.0, 50.0], [512.0, 512.0]]])
    labels3 = jnp.asarray([[1, 0, 1]], jnp.int32)
    # init only the decode path (prompt encoder + mask decoder)
    params = sam.init(jax.random.PRNGKey(0), feat, (coords3, labels3),
                      None, None, True, method="decode_masks")

    exact = sam.apply(params, feat, (coords3, labels3), None, None, True,
                      method="decode_masks")

    pad = jnp.zeros((1, 13, 2))
    coords16 = jnp.concatenate([coords3, pad], axis=1)
    labels16 = jnp.concatenate(
        [labels3, -jnp.ones((1, 13), jnp.int32)], axis=1)
    bucketed = sam.apply(params, feat, (coords16, labels16), None, None, True,
                         num_valid_points=jnp.int32(3), method="decode_masks")

    np.testing.assert_allclose(np.asarray(bucketed[0]), np.asarray(exact[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bucketed[1]), np.asarray(exact[1]),
                               rtol=1e-5, atol=1e-5)
