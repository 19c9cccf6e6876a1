"""Host->device wire codec for video crops (lossless, exact).

Uploading raw uint8 lip crops is the largest host->device transfer in the
serving path (88*88 bytes/frame: ~194 KB per audio-second — more than 40x
the fbank features). On bandwidth-limited host links (PCIe contention,
remote-host TPU topologies, tunneled devices) that transfer, not compute,
caps end-to-end throughput.

Real lip-crop video is temporally smooth, so its per-frame delta is
near-zero almost everywhere. Transports that compress in flight (and any
explicit compression layer under the runtime) move delta frames several
times faster than raw frames, while white-noise-like raw frames are
incompressible. The codec here is exact:

  encode (host):  d[0] = v[0];  d[t] = (v[t] - v[t-1]) mod 256   (uint8 wrap)
  decode (device): v[t] = cumsum(d)[t] mod 256                   (int32 cumsum)

uint8 wraparound subtraction and mod-256 cumulative sum are inverse bijections,
so reconstruction is bit-exact for any input (including hard cuts and noise —
worst case the delta is as incompressible as the raw stream, never larger).

The reference pipeline has no counterpart (single-host GPU, data loaded
device-local); this is TPU-topology plumbing, not model semantics.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def delta_encode_video(vid: np.ndarray, axis: int = -4) -> np.ndarray:
    """Temporal delta over the frame axis of uint8 crops (..., T, H, W, C).

    Wraparound uint8 subtraction; frame 0 is stored verbatim.
    """
    if vid.dtype != np.uint8:
        raise TypeError(f"delta wire codec is uint8-only, got {vid.dtype}")
    out = vid.copy()
    # uint8 arithmetic wraps mod 256 by C semantics
    sl_hi = [slice(None)] * vid.ndim
    sl_lo = [slice(None)] * vid.ndim
    sl_hi[axis] = slice(1, None)
    sl_lo[axis] = slice(None, -1)
    out[tuple(sl_hi)] = vid[tuple(sl_hi)] - vid[tuple(sl_lo)]
    return out


def delta_decode_video(delta: jnp.ndarray, axis: int = -4) -> jnp.ndarray:
    """Device-side inverse: mod-256 cumulative sum along the frame axis.

    int32 accumulation never overflows for any realistic frame count
    (T * 255 << 2**31), and the final mod-256 restores the exact bytes.
    """
    acc = jnp.cumsum(delta.astype(jnp.int32), axis=axis)
    return (acc % 256).astype(jnp.uint8)
