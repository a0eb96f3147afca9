"""GIF89a writer for turntable animations.

Counterpart of the vendored ``gif-h`` used by the reference
(``tests/main.cpp:77-115``).  Two backends:

* native C++ encoder (gvr_tpu/native, full LZW) when built;
* pure-Python fallback using a fixed 6x7x6 color cube and the
  *literal-code* LZW stream (every pixel emitted as its own 9-bit code with
  periodic clear codes).  The literal stream is valid LZW that any decoder
  accepts; it trades file size for fully-vectorized numpy encoding — no
  per-pixel Python loop.
"""

from __future__ import annotations

import numpy as np

from gvr_tpu.native import loader as _native


def write_gif(path: str, frames, delay_cs: int = 3) -> None:
    """frames: iterable of float [H,W,3] images in [0,1]."""
    frames = list(frames)
    if not frames:
        raise ValueError("no frames")
    h, w = np.asarray(frames[0]).shape[:2]

    nat = _native.lib()
    if nat is not None:
        handle = nat.gif_begin(path, w, h, delay_cs)
        if handle:
            from gvr_tpu.io.ppm import rgba_buffer
            ok = True
            for fr in frames:
                ok = ok and nat.gif_frame(handle, rgba_buffer(np.asarray(fr)))
            ok = nat.gif_end(handle) and ok
            if ok:
                return

    _write_gif_python(path, frames, w, h, delay_cs)


# -----------------------------------------------------------------------------
# Pure-Python backend
# -----------------------------------------------------------------------------

def _palette_676():
    """6x7x6 RGB cube -> 252 colors, padded to 256."""
    r = np.linspace(0, 255, 6).round().astype(np.uint8)
    g = np.linspace(0, 255, 7).round().astype(np.uint8)
    b = np.linspace(0, 255, 6).round().astype(np.uint8)
    pal = np.zeros((256, 3), np.uint8)
    idx = 0
    grid = np.stack(np.meshgrid(r, g, b, indexing="ij"), axis=-1).reshape(-1, 3)
    pal[: grid.shape[0]] = grid
    return pal


def _quantize_676(img_u8: np.ndarray) -> np.ndarray:
    """uint8 [H,W,3] -> palette indices [H,W] in the 6x7x6 cube."""
    r = (img_u8[..., 0].astype(np.uint16) * 5 + 127) // 255
    g = (img_u8[..., 1].astype(np.uint16) * 6 + 127) // 255
    b = (img_u8[..., 2].astype(np.uint16) * 5 + 127) // 255
    return (r * 42 + g * 6 + b).astype(np.uint8)


def _lzw_literal_stream(indices: np.ndarray) -> bytes:
    """Encode 8-bit palette indices as a 9-bit literal LZW code stream.

    min_code_size = 8 -> CLEAR = 256, END = 257, first dict code 258.
    Emitting CLEAR every 254 literals keeps every code at 9 bits (the
    dictionary never reaches 512), so the bitstream can be packed with pure
    numpy."""
    px = indices.reshape(-1).astype(np.uint32)
    n = px.size
    block = 254
    nblocks = (n + block - 1) // block
    # codes: CLEAR, px[0:254], CLEAR, px[254:508], ..., END
    ncodes = n + nblocks + 1
    codes = np.empty(ncodes, np.uint32)
    pos = 0
    for i in range(nblocks):
        codes[pos] = 256
        chunk = px[i * block : (i + 1) * block]
        codes[pos + 1 : pos + 1 + chunk.size] = chunk
        pos += 1 + chunk.size
    codes[pos] = 257
    pos += 1
    codes = codes[:pos]

    bitpos = np.arange(codes.size, dtype=np.int64) * 9
    byte_idx = bitpos >> 3
    shift = (bitpos & 7).astype(np.uint32)
    val = codes << shift                      # < 2^16
    nbytes = int((codes.size * 9 + 7) // 8) + 1
    buf = np.zeros(nbytes, np.uint8)
    np.add.at(buf, byte_idx, (val & 0xFF).astype(np.uint8))
    np.add.at(buf, byte_idx + 1, (val >> 8).astype(np.uint8))
    total = (codes.size * 9 + 7) // 8
    return buf[:total].tobytes()


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _write_gif_python(path, frames, w, h, delay_cs):
    from gvr_tpu.io.ppm import quantize

    pal = _palette_676()
    with open(path, "wb") as f:
        f.write(b"GIF89a")
        # logical screen descriptor: global color table, 8-bit, 256 entries
        f.write(np.array([w, h], "<u2").tobytes())
        f.write(bytes([0xF7, 0, 0]))
        f.write(pal.tobytes())
        # netscape looping extension
        f.write(b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
        for fr in frames:
            u8 = quantize(np.asarray(fr))
            idx = _quantize_676(u8)
            # graphic control extension
            f.write(b"\x21\xf9\x04\x04")
            f.write(np.array([delay_cs], "<u2").tobytes())
            f.write(b"\x00\x00")
            # image descriptor
            f.write(b"\x2c")
            f.write(np.array([0, 0, w, h], "<u2").tobytes())
            f.write(b"\x00")
            # LZW min code size + data sub-blocks
            f.write(bytes([8]))
            f.write(_sub_blocks(_lzw_literal_stream(idx)))
        f.write(b"\x3b")
