"""Block-level compression codecs for Object Container Files.

Mirrors the reference's codec matrix (/root/reference/python-udf/avro/
codecs.py:99-205): null, deflate (raw zlib, window −15), bzip2, snappy
(with a 4-byte big-endian CRC32 of the UNCOMPRESSED payload appended,
codecs.py:41-46, 145-163) and zstandard. snappy/zstandard wheels are not
in this runtime, so those two are import-guarded exactly like the
reference guards them — registered only when importable. Unknown codec
names raise UnsupportedCodec (codecs.py:199-205).
"""

from __future__ import annotations

import binascii
import bz2
import zlib
from typing import Callable, Optional


class UnsupportedCodec(ValueError):
    """Codec name is unknown or its library is unavailable here."""


class Codec:
    name: str = ""

    def compress(self, data: bytes) -> bytes:
        raise NotImplementedError

    def decompress(self, data: bytes) -> bytes:
        raise NotImplementedError


class NullCodec(Codec):
    name = "null"

    def compress(self, data: bytes) -> bytes:
        return data

    def decompress(self, data: bytes) -> bytes:
        return data


class DeflateCodec(Codec):
    """Raw deflate: no zlib header/trailer (window bits −15)."""

    name = "deflate"

    def compress(self, data: bytes) -> bytes:
        c = zlib.compressobj(zlib.Z_DEFAULT_COMPRESSION, zlib.DEFLATED, -15)
        return c.compress(data) + c.flush()

    def decompress(self, data: bytes) -> bytes:
        return zlib.decompress(data, -15)


class Bzip2Codec(Codec):
    name = "bzip2"

    def compress(self, data: bytes) -> bytes:
        return bz2.compress(data)

    def decompress(self, data: bytes) -> bytes:
        return bz2.decompress(data)


class SnappyCodec(Codec):
    """snappy frameless block + 4-byte BE CRC32 of the uncompressed data."""

    name = "snappy"

    def __init__(self) -> None:
        import snappy  # noqa: F401 — raises if unavailable

        self._snappy = snappy

    def compress(self, data: bytes) -> bytes:
        crc = binascii.crc32(data) & 0xFFFFFFFF
        return self._snappy.compress(data) + crc.to_bytes(4, "big")

    def decompress(self, data: bytes) -> bytes:
        out = self._snappy.decompress(data[:-4])
        expected = int.from_bytes(data[-4:], "big")
        actual = binascii.crc32(out) & 0xFFFFFFFF
        if actual != expected:
            raise ValueError(f"snappy CRC mismatch: {actual:#x} != {expected:#x}")
        return out


class ZstandardCodec(Codec):
    name = "zstandard"

    def __init__(self) -> None:
        import zstandard

        self._zstd = zstandard

    def compress(self, data: bytes) -> bytes:
        return self._zstd.ZstdCompressor().compress(data)

    def decompress(self, data: bytes) -> bytes:
        # streaming decompress: container blocks omit the content size
        d = self._zstd.ZstdDecompressor().decompressobj()
        return d.decompress(data)


_FACTORIES: dict[str, Callable[[], Codec]] = {
    "null": NullCodec,
    "deflate": DeflateCodec,
    "bzip2": Bzip2Codec,
    "snappy": SnappyCodec,
    "zstandard": ZstandardCodec,
}

_CACHE: dict[str, Codec] = {}


def get_codec(name: Optional[str]) -> Codec:
    name = (name or "null").lower()
    if name in _CACHE:
        return _CACHE[name]
    factory = _FACTORIES.get(name)
    if factory is None:
        raise UnsupportedCodec(f"unknown codec: {name!r}")
    try:
        codec = factory()
    except ImportError as exc:
        raise UnsupportedCodec(f"codec {name!r} needs a library not present: {exc}") from exc
    _CACHE[name] = codec
    return codec


def list_codecs(available_only: bool = True) -> list[str]:
    names = []
    for name in _FACTORIES:
        if available_only:
            try:
                get_codec(name)
            except UnsupportedCodec:
                continue
        names.append(name)
    return names
