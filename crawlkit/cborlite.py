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


def _encode_head(major: int, value: int, out: bytearray) -> None:
    if value < 24:
        out.append((major << 5) | value)
    elif value < 0x100:
        out.append((major << 5) | 24)
        out.append(value)
    elif value < 0x10000:
        out.append((major << 5) | 25)
        out += value.to_bytes(2, "big")
    elif value < 0x100000000:
        out.append((major << 5) | 26)
        out += value.to_bytes(4, "big")
    else:
        out.append((major << 5) | 27)
        out += value.to_bytes(8, "big")


# Encoded-bytes memo for map keys: node trees reuse a handful of key
# strings ("type", "attrs", "content", …) tens of thousands of times
# per document — encode each once.  Bounded; values are tiny.
_KEY_CACHE: dict[str, bytes] = {}

# Key-ORDER memo: node dicts reuse a handful of key-tuple shapes
# (("type","text"), ("type","attrs","content"), …).  The canonical
# (encoded-bytes-sorted) visit order per shape is computed once, so the
# per-dict sort + entry-tuple list disappear from the hot path.
_ORDER_CACHE: dict[tuple, list[tuple[str, bytes]]] = {}


def _key_bytes(key: str) -> bytes:
    kbytes = _KEY_CACHE.get(key)
    if kbytes is None:
        kout = bytearray()
        _encode_item(key, kout)
        kbytes = bytes(kout)
        if len(_KEY_CACHE) < 4096:
            _KEY_CACHE[key] = kbytes
    return kbytes


def _encode_item(obj: object, out: bytearray) -> None:
    # hot path first: the doc tree is dicts/lists/strings
    t = type(obj)
    if t is str:
        data = obj.encode("utf-8")
        n = len(data)
        if n < 24:  # inlined common-case head
            out.append(0x60 | n)
        else:
            _encode_head(3, n, out)
        out += data
    elif t is dict:
        keys = tuple(obj)
        order = _ORDER_CACHE.get(keys)
        if order is None and all(type(k) is str for k in keys):
            order = sorted(
                ((k, _key_bytes(k)) for k in keys), key=lambda kv: kv[1]
            )
            if len(_ORDER_CACHE) < 4096:
                _ORDER_CACHE[keys] = order
        if order is not None:
            n = len(order)
            if n < 24:
                out.append(0xA0 | n)
            else:
                _encode_head(5, n, out)
            for key, kbytes in order:
                out += kbytes
                v = obj[key]
                if type(v) is str:  # inline leaf fast path
                    data = v.encode("utf-8")
                    n = len(data)
                    if n < 24:
                        out.append(0x60 | n)
                    else:
                        _encode_head(3, n, out)
                    out += data
                else:
                    _encode_item(v, out)
            return
        # rare: non-string keys — full injective encoded-bytes sort
        entries = []
        for key, value in obj.items():
            kout = bytearray()
            _encode_item(key, kout)
            entries.append((bytes(kout), value))
        # encodings are injective and map keys unique → no ties, the
        # value element is never compared
        entries.sort(key=lambda kv: kv[0])
        _encode_head(5, len(entries), out)
        for kbytes, value in entries:
            out += kbytes
            _encode_item(value, out)
    elif t is list or t is tuple:
        n = len(obj)
        if n < 24:
            out.append(0x80 | n)
        else:
            _encode_head(4, n, out)
        for item in obj:
            if type(item) is str:  # inline leaf fast path
                data = item.encode("utf-8")
                n = len(data)
                if n < 24:
                    out.append(0x60 | n)
                else:
                    _encode_head(3, n, out)
                out += data
            else:
                _encode_item(item, out)
    elif obj is None:
        out.append(0xF6)
    elif obj is True:
        out.append(0xF5)
    elif obj is False:
        out.append(0xF4)
    elif isinstance(obj, int):
        if obj >= 0:
            _encode_head(0, obj, out)
        else:
            _encode_head(1, -1 - obj, out)
    elif isinstance(obj, float):
        # deterministic: always encode float64 (RFC 8949 allows fixed width)
        out.append(0xFB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, bytes):
        _encode_head(2, len(obj), out)
        out += obj
    elif isinstance(obj, str):  # str subclass
        data = obj.encode("utf-8")
        _encode_head(3, len(data), out)
        out += data
    elif isinstance(obj, (list, tuple)):
        _encode_head(4, len(obj), out)
        for item in obj:
            _encode_item(item, out)
    elif isinstance(obj, dict):
        _encode_item(dict(obj), out)
    else:
        raise TypeError(f"cannot CBOR-encode {type(obj).__name__}")


def dumps(obj: object) -> bytes:
    out = bytearray()
    _encode_item(obj, out)
    return bytes(out)


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
