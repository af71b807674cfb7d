from intrinsicnerf_tpu.core.pe import positional_encoding, pe_output_dim
from intrinsicnerf_tpu.core.rays import (
    camera_ray_dirs,
    rays_to_world,
    create_rays,
    ndc_rays,
)
from intrinsicnerf_tpu.core.sampling import (
    stratified_z_vals,
    perturb_z_vals,
    sample_pdf,
)
from intrinsicnerf_tpu.core.compositing import RawOutputs, RenderMaps, composite
