"""Real-weight SAM checkpoint readiness (BASELINE: mask mIoU >= 0.95 vs
PyTorch SAM with released weights).

Runs only when a released SAM checkpoint is present; the CI environment
ships none, so this documents the expected locations and keeps the
conversion path exercised the moment weights are dropped in:

  $SAM_CHECKPOINT, ./checkpoints/sam_vit_b_01ec64.pth,
  ./checkpoints/sam_vit_h_4b8939.pth, ~/checkpoints/...

Download (official): https://dl.fbaipublicfiles.com/segment_anything/
"""
import importlib.util
import os
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

CANDIDATES = [
    os.environ.get("SAM_CHECKPOINT") or "",
    "checkpoints/sam_vit_b_01ec64.pth",
    "checkpoints/sam_vit_h_4b8939.pth",
    str(Path.home() / "checkpoints/sam_vit_b_01ec64.pth"),
    str(Path.home() / "checkpoints/sam_vit_h_4b8939.pth"),
]


def _find_checkpoint():
    for c in CANDIDATES:
        if c and Path(c).exists():
            return Path(c)
    return None


CKPT = _find_checkpoint()
pytestmark = pytest.mark.skipif(
    CKPT is None, reason="no released SAM checkpoint present "
    "(set SAM_CHECKPOINT or place sam_vit_{b,h}_*.pth under ./checkpoints)")


def _model_type(path: Path) -> str:
    return "vit_h" if "vit_h" in path.name else (
        "vit_l" if "vit_l" in path.name else "vit_b")


def _test_image() -> np.ndarray:
    ref = Path("/root/reference/test.jpg")
    if ref.exists():
        from PIL import Image
        return np.asarray(Image.open(ref).convert("RGB"))
    # deterministic synthetic scene: bright disk on gradient background
    h = w = 512
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // w, yy * 255 // h,
                    np.full_like(xx, 80)], -1).astype(np.uint8)
    disk = (yy - 256) ** 2 + (xx - 200) ** 2 < 90 ** 2
    img[disk] = (250, 240, 30)
    return img


def _load_ref_sam(model_type: str, ckpt: Path):
    """Reference torch SAM built from /root/reference's vendored fork."""
    import types

    ref_dir = "/root/reference/samnerf/segment_anything"
    pkg = types.ModuleType("refsegany")
    pkg.__path__ = [ref_dir]
    sys.modules["refsegany"] = pkg
    mod_dir = f"{ref_dir}/modeling"
    mpkg = types.ModuleType("refsegany.modeling")
    mpkg.__path__ = [mod_dir]
    sys.modules["refsegany.modeling"] = mpkg
    mods = {}
    for n in ("common", "image_encoder", "prompt_encoder", "transformer",
              "mask_decoder", "sam"):
        spec = importlib.util.spec_from_file_location(
            f"refsegany.modeling.{n}", f"{mod_dir}/{n}.py")
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"refsegany.modeling.{n}"] = m
        spec.loader.exec_module(m)
        mods[n] = m
    spec = importlib.util.spec_from_file_location(
        "refsegany.build_sam", f"{ref_dir}/build_sam.py")
    bs = importlib.util.module_from_spec(spec)
    sys.modules["refsegany.build_sam"] = bs
    spec.loader.exec_module(bs)
    return bs.sam_model_registry[model_type](checkpoint=str(ckpt))


def test_real_checkpoint_decode_miou():
    """Convert the released .pth, run set_image + point decode end to end,
    and compare masks with the reference torch SAM on the same image."""
    from samnerf_tpu.perception.sam.build_sam import build_sam
    from samnerf_tpu.perception.sam.predictor import SamPredictor

    model_type = _model_type(CKPT)
    sam, params = build_sam(model_type, checkpoint=str(CKPT))
    assert params is not None
    pred = SamPredictor(sam, params)

    img = _test_image()
    pred.set_image(img)
    clicks = np.array([[200.0, 256.0], [420.0, 100.0]])
    labels = np.array([1, 1])
    ours, ours_iou, _ = pred.predict(point_coords=clicks,
                                     point_labels=labels,
                                     multimask_output=True)

    t_sam = _load_ref_sam(model_type, CKPT)
    t_sam.eval()
    with torch.no_grad():
        from torchvision.transforms.functional import resize  # noqa: F401
        # reference predictor path
        spec = importlib.util.spec_from_file_location(
            "refsegany.predictor",
            "/root/reference/samnerf/segment_anything/predictor.py")
        pr = importlib.util.module_from_spec(spec)
        sys.modules["refsegany.predictor"] = pr
        spec.loader.exec_module(pr)
        t_pred = pr.SamPredictor(t_sam)
        t_pred.set_image(img)
        theirs, theirs_iou, _ = t_pred.predict(
            point_coords=clicks, point_labels=labels, multimask_output=True)

    inter = np.logical_and(ours, theirs).sum()
    union = np.logical_or(ours, theirs).sum()
    miou = inter / max(union, 1)
    assert miou >= 0.95, f"real-weight decode mIoU {miou:.4f} < 0.95"
    np.testing.assert_allclose(ours_iou, theirs_iou, rtol=0.05, atol=0.02)
