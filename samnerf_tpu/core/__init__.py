from samnerf_tpu.core.rays import RayBundle, RaySamples
from samnerf_tpu.core.contraction import scene_contraction, contract_to_unit
