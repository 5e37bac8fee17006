"""Pure-stdlib/numpy media codecs: PNG (RFC 2083) and WAV (RIFF PCM).

The container has no PIL/soundfile/cv2, but PNG needs only ``zlib``
(stdlib) and WAV needs only ``wave`` (stdlib) — so the multimodal
stages can run REAL decode on these formats instead of the labelled
deterministic fakes.  Supported PNG subset: bit depth 8, color types
0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced, all five
scanline filters.  The encoder exists for fixtures and roundtrip
tests (any of the five filter types, applied uniformly).

Everything here is from the public specs: PNG RFC 2083 / ISO 15948
(filter definitions §6, Paeth predictor §6.6) and the RIFF/WAVE
format.  No external data, no network.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CT_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_CT = {1: 0, 3: 2, 2: 4, 4: 6}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 array (C = 1/2/3/4)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, bytearray()
    w = h = ct = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, bitd, ct, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if bitd != 8 or interlace != 0 or ct not in _CT_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (bitdepth={bitd} ct={ct} interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    nch = _CT_CHANNELS[ct]
    stride = w * nch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG data size mismatch")
    raw = raw.reshape(h, stride + 1)
    ftypes, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    bpp = nch  # bytes per pixel at bit depth 8
    for y in range(h):
        f = int(ftypes[y])
        cur = lines[y]
        prior = out[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:  # None
            out[y] = cur
        elif f == 2:  # Up — fully vectorised (uint8 wraps mod 256)
            out[y] = cur + prior
        elif f == 1:  # Sub — sequential in x, vectorise over channels
            row = out[y]
            row[:bpp] = cur[:bpp]
            for x in range(bpp, stride):
                row[x] = (int(cur[x]) + int(row[x - bpp])) & 0xFF
        elif f == 3:  # Average
            row = out[y]
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(cur[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            row = out[y]
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                c = int(prior[x - bpp]) if x >= bpp else 0
                row[x] = (int(cur[x]) + _paeth(a, int(prior[x]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
    return out.reshape(h, w, nch)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W[, C]) uint8 → PNG bytes, one filter type for every line."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    ct = _CHANNELS_CT[nch]
    flat = arr.reshape(h, w * nch)
    stride, bpp = w * nch, nch
    lines = bytearray()
    prior = np.zeros(stride, np.int32)
    for y in range(h):
        cur = flat[y].astype(np.int32)
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            filt = (cur - left) & 0xFF
        elif filter_type == 2:
            filt = (cur - prior) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            filt = (cur - ((left + prior) >> 1)) & 0xFF
        elif filter_type == 4:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            pleft = np.concatenate([np.zeros(bpp, np.int32), prior[:-bpp]])
            pred = np.array(
                [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prior, pleft)],
                dtype=np.int32,
            )
            filt = (cur - pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines += bytes([filter_type]) + filt.astype(np.uint8).tobytes()
        prior = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono/stereo samples → RIFF/WAVE PCM bytes."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        samples = np.clip(np.round(samples * 32767.0), -32768, 32767).astype(np.int16)
    nch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(nch)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → (float64 samples in [-1, 1), sample rate).
    Stereo is averaged to mono."""
    with wave.open(io.BytesIO(data), "rb") as f:
        nch, sw, rate, nframes = (
            f.getnchannels(),
            f.getsampwidth(),
            f.getframerate(),
            f.getnframes(),
        )
        raw = f.readframes(nframes)
    if sw == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate
