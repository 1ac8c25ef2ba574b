from samnerf_tpu.perception.sam.build_sam import (build_sam_vit_b,
                                                  build_sam_vit_h,
                                                  build_sam_vit_l,
                                                  sam_model_registry)
from samnerf_tpu.perception.sam.predictor import SamPredictor
