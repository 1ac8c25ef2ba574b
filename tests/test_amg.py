"""AMG utility tests + a tiny end-to-end everything-mode run."""
import numpy as np
import pytest

from samnerf_tpu.perception.sam import amg


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = rng.rand(17, 23) > 0.5
    rle = amg.mask_to_rle(mask)
    np.testing.assert_array_equal(amg.rle_to_mask(rle), mask)
    assert amg.area_from_rle(rle) == int(mask.sum())


def test_point_grid():
    g = amg.build_point_grid(4)
    assert g.shape == (16, 2)
    assert g.min() == 1 / 8 and g.max() == 1 - 1 / 8


def test_stability_score():
    logits = np.full((1, 10, 10), -5.0, np.float32)
    logits[0, 2:8, 2:8] = 5.0  # rock solid region
    s = amg.calculate_stability_score(logits, 0.0, 1.0)
    assert s[0] == 1.0
    soft = np.linspace(-1, 1, 100).reshape(1, 10, 10).astype(np.float32)
    s2 = amg.calculate_stability_score(soft, 0.0, 0.5)
    assert s2[0] < 1.0


def test_batched_mask_to_box():
    masks = np.zeros((2, 8, 8), bool)
    masks[0, 2:5, 3:7] = True
    box = amg.batched_mask_to_box(masks)
    np.testing.assert_array_equal(box[0], [3, 2, 7, 5])
    np.testing.assert_array_equal(box[1], [0, 0, 0, 0])  # empty -> zeros


def test_nms():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7])
    keep = amg.nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(sorted(keep), [0, 2])


def test_remove_small_regions():
    mask = np.zeros((12, 12), bool)
    mask[2:10, 2:10] = True
    mask[5, 5] = False  # small hole
    out, changed = amg.remove_small_regions(mask, area_thresh=4, mode="holes")
    assert changed and out[5, 5]
    mask2 = mask.copy()
    mask2[0, 0] = True  # small island
    out2, changed2 = amg.remove_small_regions(mask2, 4, "islands")
    assert changed2 and not out2[0, 0]


def test_crop_boxes():
    boxes, layers = amg.generate_crop_boxes((100, 150), n_layers=1,
                                            overlap_ratio=0.2)
    assert boxes[0] == [0, 0, 150, 100] and layers[0] == 0
    assert len(boxes) == 1 + 4 and set(layers[1:]) == {1}


@pytest.mark.slow
def test_everything_mode_tiny():
    """Random-weight SAM; checks the full generate() plumbing."""
    import jax
    import jax.numpy as jnp
    from samnerf_tpu.perception.sam.automatic_mask_generator import \
        SamAutomaticMaskGenerator
    from samnerf_tpu.perception.sam.build_sam import build_sam
    from samnerf_tpu.perception.sam.predictor import SamPredictor

    sam, _ = build_sam("vit_b")
    params = jax.jit(lambda r: sam.init(
        r, jnp.zeros((1, 16, 16, 3)),
        points=(jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32))))(
            jax.random.PRNGKey(0))
    pred = SamPredictor(sam, params)
    gen = SamAutomaticMaskGenerator(pred, points_per_side=2,
                                    points_per_batch=4,
                                    pred_iou_thresh=-1e9,
                                    stability_score_thresh=0.0)
    feature = np.random.RandomState(0).randn(32, 64, 256).astype(np.float32)
    anns = gen.generate(np.zeros((64, 128, 3), np.uint8), feature=feature)
    assert isinstance(anns, list)
    for a in anns:
        assert set(a) >= {"segmentation", "area", "bbox", "predicted_iou",
                          "point_coords", "stability_score", "crop_box"}
        assert a["segmentation"].shape == (64, 128)
