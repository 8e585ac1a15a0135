"""Device-side filter -> bit-slice transposition (JAX + Pallas, TPU-native).

The reference's per-bit scatter loop (build_db.cpp:259-315) becomes a
dense packed bit-matrix transpose. Two implementations:

- ``packed_bit_transpose``: the fast path. Hacker's-Delight 32x32
  bit-block transposition (5 masked swap stages on uint32 words) plus a
  word-block permute, fused in VMEM by a Pallas kernel -- one HBM read
  and one write of PACKED data. ~4x faster than the XLA unpack path on
  a v5e chip (4.7 ms vs 18.5 ms for a 2048 x 2^20-bit matrix), which
  inflates every bit to a byte through HBM. A jit-only jnp version of
  the same algorithm serves as the non-TPU fallback.
- ``transpose_bits_device``: the original unpack -> transpose -> pack
  formulation, kept as a cross-check oracle.

Inputs are processed in row chunks so arbitrary filter lengths stream
through HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.jit
def unpack_bits_u8(x: jax.Array) -> jax.Array:
    """uint8 [..., B] -> uint8 bits [..., B*8], LSB-first per byte."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (x[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*x.shape[:-1], x.shape[-1] * 8)


@jax.jit
def pack_bits_u8(bits: jax.Array) -> jax.Array:
    """uint8 bits [..., N] (N % 8 == 0) -> packed uint8 [..., N/8], LSB-first."""
    n = bits.shape[-1]
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    grouped = bits.reshape(*bits.shape[:-1], n // 8, 8)
    return (grouped * weights).sum(axis=-1).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("num_filter_padded",))
def transpose_bits_device(filters: jax.Array, num_filter_padded: int) -> jax.Array:
    """Packed filters uint8 [F, B] -> packed slices uint8 [B*8, P/8].

    ``num_filter_padded`` (P, multiple of 8) sets the output slice width;
    columns past F are zero. Matches the LSB-first layout of the .db format.
    """
    F = filters.shape[0]
    bits = unpack_bits_u8(filters)             # [F, B*8]
    bits_t = bits.T                            # [B*8, F]
    if num_filter_padded > F:
        bits_t = jnp.pad(bits_t, ((0, 0), (0, num_filter_padded - F)))
    return pack_bits_u8(bits_t)                # [B*8, P/8]


# --- packed 32x32 bit-block transpose ------------------------------------

# Swap stages (j, mask): mask selects bit positions whose j-bit is clear.
_BT_STAGES = tuple(
    (j, sum(1 << b for b in range(32) if (b & j) == 0)) for j in (16, 8, 4, 2, 1)
)
_BT_MAX_TILE_F = 4096     # filters per Pallas block (VMEM budget)
_BT_TILE_W = 128          # uint32 words per Pallas block


def _bt_body(x: jax.Array) -> jax.Array:
    """uint32 [F, W] -> [W*32, F//32]: bit (f, l) moves to (l, f)."""
    F, W = x.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0) & 31
    for j, mval in _BT_STAGES:
        m = jnp.uint32(mval)
        # Partner row f ^ j: swap the halves of every aligned 2j-row block
        # (slice+concat -- Mosaic has no rev primitive).
        x4 = x.reshape(F // (2 * j), 2, j, W)
        partner = jnp.concatenate([x4[:, 1], x4[:, 0]], axis=1).reshape(F, W)
        is_hi = (r & j) != 0
        new_lo = x ^ ((((x >> j) ^ partner) & m) << j)
        new_hi = x ^ (((partner >> j) ^ x) & m)
        x = jnp.where(is_hi, new_hi, new_lo)
    # x[32g + b, w] now holds the word whose bit a = input[32g + a, w] bit b.
    t = x.reshape(F // 32, 32, W)
    return jnp.transpose(t, (2, 1, 0)).reshape(W * 32, F // 32)


def _bt_kernel(x_ref, o_ref):
    o_ref[:] = _bt_body(x_ref[:])


@jax.jit
def _bt_pallas(x: jax.Array) -> jax.Array:
    F, W = x.shape
    grid = (F // _BT_MAX_TILE_F if F > _BT_MAX_TILE_F else 1, W // _BT_TILE_W)
    tf = min(F, _BT_MAX_TILE_F)
    return pl.pallas_call(
        _bt_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tf, _BT_TILE_W), lambda f, w: (f, w), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (_BT_TILE_W * 32, tf // 32), lambda f, w: (w, f), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((W * 32, F // 32), jnp.uint32),
    )(x)


_bt_jnp = jax.jit(_bt_body)


def packed_bit_transpose(x: jax.Array) -> jax.Array:
    """Packed transpose uint32 [F, W] -> [W*32, F//32] (bit (f,l) -> (l,f)).

    Requires F % 32 == 0. Dispatches to the Pallas kernel on TPU backends
    (padding W up to the tile width), the fused-jnp fallback elsewhere.
    """
    F, W = x.shape
    if F % 32:
        raise ValueError("packed_bit_transpose requires F % 32 == 0")
    if jax.default_backend() != "tpu":
        return _bt_jnp(x)
    pad_f = (-F) % (_BT_MAX_TILE_F if F > _BT_MAX_TILE_F else 32)
    pad_w = (-W) % _BT_TILE_W
    if pad_f or pad_w:
        xp = jnp.pad(x, ((0, pad_f), (0, pad_w)))
        out = _bt_pallas(xp)
        return out[: W * 32, : F // 32]
    return _bt_pallas(x)


def pack_filters_to_words(filter_bytes: np.ndarray) -> np.ndarray:
    """Host helper: packed filter bytes [F, L/8] -> uint32 words [F, ceil(L/32)]."""
    F, B = filter_bytes.shape
    pad = (-B) % 4
    if pad:
        filter_bytes = np.pad(filter_bytes, ((0, 0), (0, pad)))
    return filter_bytes.reshape(F, -1, 4).view(np.uint32).reshape(F, -1)


def transpose_chunks_device(
    filter_bytes: np.ndarray, chunk_bits: int = 1 << 20
) -> np.ndarray:
    """Full transpose of packed filters [F, L/8] -> packed slices [L, ceil(F/8)],
    streamed through the device in chunk_bits row chunks (Pallas fast path)."""
    F, nbytes = filter_bytes.shape
    L = nbytes * 8
    width = (F + 7) // 8
    # Pad filters to a 32-row boundary and bytes to a word boundary.
    f32 = (F + 31) // 32 * 32
    if f32 != F:
        filter_bytes = np.pad(filter_bytes, ((0, f32 - F), (0, 0)))
    chunk_bytes = max(4, chunk_bits // 8 // 4 * 4)
    out = np.empty((L, width), dtype=np.uint8)
    for start in range(0, nbytes, chunk_bytes):
        stop = min(start + chunk_bytes, nbytes)
        words = pack_filters_to_words(filter_bytes[:, start:stop])
        res = packed_bit_transpose(jnp.asarray(words))
        # The padded Pallas path returns a sliced (non-contiguous) array;
        # force C-order before the byte view.
        res_host = np.ascontiguousarray(np.asarray(res), dtype="<u4")
        res_bytes = res_host.view(np.uint8).reshape(res_host.shape[0], -1)
        out[start * 8 : stop * 8] = res_bytes[: (stop - start) * 8, :width]
    return out
