"""Single-image language-prompted SAM demo.

Reference: ``samclip.ipynb`` + the gradio UI in ``samnerf/langsam.py:147-165``
(gradio is unavailable here; this is the script equivalent).

Usage:
    python examples/langsam_demo.py --image test.jpg --prompt "a dog" \
        --sam-checkpoint sam_vit_h_4b8939.pth --out masked.png
"""
import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--sam-checkpoint", default=None)
    ap.add_argument("--clipseg-checkpoint", default=None)
    ap.add_argument("--model-type", default="vit_h")
    ap.add_argument("--topk", type=int, default=5)
    ap.add_argument("--thresh", type=float, default=0.5)
    ap.add_argument("--out", default="masked.png")
    args = ap.parse_args()

    from PIL import Image
    from samnerf_tpu.perception.clipseg.pipeline import ClipSegPredictor
    from samnerf_tpu.perception.langsam import LanguageSAM
    from samnerf_tpu.perception.sam.build_sam import sam_model_registry
    from samnerf_tpu.perception.sam.predictor import SamPredictor

    sam, sam_params = sam_model_registry[args.model_type](
        checkpoint=args.sam_checkpoint)
    lang_sam = LanguageSAM(
        SamPredictor(sam, sam_params),
        ClipSegPredictor(clipseg_checkpoint=args.clipseg_checkpoint))
    img = np.asarray(Image.open(args.image).convert("RGB"))
    masked = lang_sam.set_and_segment(img, args.prompt, pts=args.topk,
                                      thres=args.thresh)
    Image.fromarray((np.clip(masked, 0, 1) * 255).astype(np.uint8)).save(
        args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
