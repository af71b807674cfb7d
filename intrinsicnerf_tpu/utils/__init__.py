from intrinsicnerf_tpu.utils.image import (
    to8b,
    depth2rgb,
    label_colormap,
    nyu13_colour_code,
    nyu40_colour_code,
    plot_semantic_legend,
)
