"""Sinusoidal positional encoding.

Behavioral parity target: the reference ``Embedder`` / ``get_embedder``
(``/root/reference/SSR/models/semantic_nerf.py:14-65``): log-spaced
frequencies ``2^0 .. 2^(multires-1)``, output ordered as
``[x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...]``, with the input
first divided by ``scalar_factor`` (scene-scale normalization; the scene
pipeline uses 10 for positions, 1 for view directions,
``trainer.py:817-824``).

TPU notes: the encoding is a pure elementwise expansion; under jit XLA
fuses it into the consumer matmul's producer.  The fused Pallas MLP
kernel (``ops/fused_mlp.py``) recomputes it in-VMEM instead of round-
tripping the 63-d embedding through HBM.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pe_output_dim(num_freqs: int, input_dim: int = 3, include_input: bool = True) -> int:
    return input_dim * (2 * num_freqs + (1 if include_input else 0))


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int,
    include_input: bool = True,
    scalar_factor: float = 1.0,
) -> jnp.ndarray:
    """Encode ``x[..., D] -> [..., D*(1 + 2*num_freqs)]``.

    Output ordering matches the reference exactly: raw input first, then
    for each frequency ``f`` the blocks ``sin(f*x)`` and ``cos(f*x)``
    (each D-dimensional).
    """
    if scalar_factor != 1.0:
        x = x / scalar_factor
    if num_freqs == 0:
        return x if include_input else x[..., :0]

    freqs = jnp.asarray(2.0 ** np.arange(num_freqs), dtype=x.dtype)  # [F]
    # [..., F, D]
    xf = x[..., None, :] * freqs[:, None]
    # [..., F, 2, D] with sin before cos per frequency.
    enc = jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], num_freqs * 2 * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
