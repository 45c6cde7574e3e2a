"""Pure-stdlib WAV (RIFF) codec: the live branch behind the real audio
container decode, completing the codec trio next to png_codec.py.

The container ships no audio library, but WAV itself needs none: the
format is a RIFF chunk list holding an ``fmt `` header and raw PCM in a
``data`` chunk. This module implements a real parser — RIFF/WAVE
signature check, chunk walk with word-aligned padding, fmt parse
(PCM16 only), data extraction — and a matching encoder, so audio
operators wrap, decode, and feature-extract genuine container bytes end
to end with no third-party codec. The PCM payload then feeds the same
int16 numpy DSP as :func:`operators.multimodal.pcm_features`.

Deliberately NOT supported (raise ValueError, callers map to NULL/skip):
compressed codecs (format tags other than 1/PCM), bit depths other than
16. Those are a completeness tail, not a different architecture.
"""

from __future__ import annotations

import struct


def encode_wav(pcm: bytes, sample_rate: int, n_channels: int = 1) -> bytes:
    """Wrap little-endian PCM16 bytes in a canonical RIFF/WAVE container.

    Odd trailing bytes are truncated (a PCM16 stream is 2-byte framed),
    matching pcm_features' decode discipline.
    """
    if sample_rate <= 0 or n_channels <= 0:
        raise ValueError("sample_rate and n_channels must be positive")
    data = pcm[: len(pcm) // 2 * 2]
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunks(data: bytes):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    pos = 12
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        yield ctype, body
        # RIFF chunks are word-aligned: odd payloads carry a pad byte
        pos += 8 + length + (length % 2)


def decode_wav(data: bytes) -> tuple[int, int, bytes]:
    """Parse a WAV container; return (sample_rate, n_channels, pcm bytes).

    Walks the chunk list (tolerating extra chunks like LIST/INFO), parses
    the PCM16 ``fmt `` header, and returns the raw little-endian PCM
    payload from the ``data`` chunk.
    """
    sample_rate = n_channels = None
    pcm = None
    for ctype, body in _chunks(data):
        if ctype == b"fmt ":
            if len(body) < 16:
                raise ValueError("fmt chunk too short")
            tag, n_channels, sample_rate, _rate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 1:
                raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits} (16 only)")
            # a crafted fmt with 0 channels/rate must dead-letter, not
            # ZeroDivisionError past the callers' ValueError handlers
            if n_channels < 1 or sample_rate < 1:
                raise ValueError("fmt declares non-positive channels/rate")
        elif ctype == b"data":
            pcm = body
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    return int(sample_rate), int(n_channels), pcm


def wav_info(data: bytes) -> tuple[int, int, int]:
    """(sample_rate, n_channels, n_samples) without copying the payload."""
    sample_rate, n_channels, pcm = decode_wav(data)
    return sample_rate, n_channels, len(pcm) // 2 // n_channels
