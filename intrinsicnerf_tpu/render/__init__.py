from intrinsicnerf_tpu.render.pipeline import (
    RenderConfig,
    RenderResult,
    render_rays,
    render_rays_chunked,
)
