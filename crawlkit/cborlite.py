"""Canonical CBOR (RFC 8949) encoder/decoder for doc content blobs.

The reference stores the amended node tree as CBOR bytes
(``/root/reference/src/db/model.ts:69-71``, X9 in SURVEY.md §2.9).  No
``cbor2`` wheel is available in this environment, and byte-stable output
requires *deterministic* encoding anyway, so this is a small pure-Python
encoder implementing RFC 8949 §4.2.1 core deterministic encoding:

* definite lengths everywhere,
* smallest-possible integer heads,
* map keys sorted by their encoded bytes.

Supports the types the node trees use: dict/list/str/bytes/int/float/
bool/None.  The decoder exists for tests and round-tripping.
"""

from __future__ import annotations

import struct


def _encode_head(major: int, value: int, out: list[bytes]) -> None:
    if value < 24:
        out.append(bytes([(major << 5) | value]))
    elif value < 0x100:
        out.append(bytes([(major << 5) | 24, value]))
    elif value < 0x10000:
        out.append(bytes([(major << 5) | 25]) + value.to_bytes(2, "big"))
    elif value < 0x100000000:
        out.append(bytes([(major << 5) | 26]) + value.to_bytes(4, "big"))
    else:
        out.append(bytes([(major << 5) | 27]) + value.to_bytes(8, "big"))


def _encode_item(obj: object, out: list[bytes]) -> None:
    if obj is None:
        out.append(b"\xf6")
    elif obj is True:
        out.append(b"\xf5")
    elif obj is False:
        out.append(b"\xf4")
    elif isinstance(obj, int):
        if obj >= 0:
            _encode_head(0, obj, out)
        else:
            _encode_head(1, -1 - obj, out)
    elif isinstance(obj, float):
        # deterministic: always encode float64 (RFC 8949 allows fixed width)
        out.append(b"\xfb" + struct.pack(">d", obj))
    elif isinstance(obj, bytes):
        _encode_head(2, len(obj), out)
        out.append(obj)
    elif isinstance(obj, str):
        data = obj.encode("utf-8")
        _encode_head(3, len(data), out)
        out.append(data)
    elif isinstance(obj, (list, tuple)):
        _encode_head(4, len(obj), out)
        for item in obj:
            _encode_item(item, out)
    elif isinstance(obj, dict):
        entries = []
        for key, value in obj.items():
            kout: list[bytes] = []
            _encode_item(key, kout)
            entries.append((b"".join(kout), value))
        entries.sort(key=lambda kv: kv[0])
        _encode_head(5, len(entries), out)
        for kbytes, value in entries:
            out.append(kbytes)
            _encode_item(value, out)
    else:
        raise TypeError(f"cannot CBOR-encode {type(obj).__name__}")


def dumps(obj: object) -> bytes:
    out: list[bytes] = []
    _encode_item(obj, out)
    return b"".join(out)


class _Decoder:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def _read(self, n: int) -> bytes:
        chunk = self.data[self.pos : self.pos + n]
        if len(chunk) != n:
            raise ValueError("truncated CBOR")
        self.pos += n
        return chunk

    def _head(self) -> tuple[int, int]:
        byte = self._read(1)[0]
        major, info = byte >> 5, byte & 0x1F
        if info < 24:
            return major, info
        if info == 24:
            return major, self._read(1)[0]
        if info == 25:
            return major, int.from_bytes(self._read(2), "big")
        if info == 26:
            return major, int.from_bytes(self._read(4), "big")
        if info == 27:
            return major, int.from_bytes(self._read(8), "big")
        raise ValueError(f"unsupported CBOR head info {info}")

    def decode(self) -> object:
        start = self.pos
        byte = self.data[self.pos]
        if byte == 0xF6 or byte == 0xF7:
            self.pos += 1
            return None
        if byte == 0xF5:
            self.pos += 1
            return True
        if byte == 0xF4:
            self.pos += 1
            return False
        if byte == 0xFB:
            self.pos += 1
            return struct.unpack(">d", self._read(8))[0]
        if byte == 0xF9:
            import numpy as np

            self.pos += 1
            return float(np.frombuffer(self._read(2), dtype=">f2")[0])
        if byte == 0xFA:
            self.pos += 1
            return struct.unpack(">f", self._read(4))[0]
        major, value = self._head()
        if major == 0:
            return value
        if major == 1:
            return -1 - value
        if major == 2:
            return self._read(value)
        if major == 3:
            return self._read(value).decode("utf-8")
        if major == 4:
            return [self.decode() for _ in range(value)]
        if major == 5:
            return {self.decode(): self.decode() for _ in range(value)}
        raise ValueError(f"unsupported CBOR major {major} at {start}")


def loads(data: bytes) -> object:
    return _Decoder(data).decode()
