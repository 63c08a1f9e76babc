"""TFRecord + tf.train.Example codec with no TensorFlow dependency.

Wire formats implemented from their public specs:

  TFRecord framing (per record):
      uint64 length (LE) | uint32 masked_crc32c(length) |
      bytes payload      | uint32 masked_crc32c(payload)
  with masked_crc = rotr15(crc32c(x)) + 0xa282ead8.

  tf.train.Example protobuf:
      Example{ Features features=1 } ; Features{ map<string,Feature>=1 } ;
      Feature{ oneof: BytesList=1, FloatList=2 (packed floats),
               Int64List=3 (packed varints) }

Reading skips CRC verification by default (``verify=False``) — the payloads
feed numpy parsers that fail loudly on corruption anyway; writing always
emits valid CRCs so TensorFlow-based consumers accept our files (the
reference's eval tooling can read LINEMOD conversions we produce, matching
``linemod_data/linemod_to_tfrecord_small.py:189-249``).

A faster C++ reader with the same record framing lives in native/ (ctypes
binding, see data.ycb); this pure-Python module is the reference
implementation and fallback.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np

# ------------------------------------------------------------------ crc32c

_CRC_TABLE = None


def _crc32c_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78  # Castagnoli, reflected
        table = np.zeros(256, np.uint32)
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table[i] = c
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    """Table-driven CRC32C, vectorized enough for record-sized payloads."""
    table = _crc32c_table()
    crc = np.uint32(0xFFFFFFFF)
    for b in data:
        crc = table[(crc ^ np.uint32(b)) & np.uint32(0xFF)] ^ (crc >> np.uint32(8))
    return int(crc ^ np.uint32(0xFFFFFFFF))


def masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ------------------------------------------------------------ tfrecord IO


def iter_tfrecord(path: str, verify: bool = False) -> Iterator[bytes]:
    """Yield raw record payloads from a TFRecord file."""
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                return
            (length,) = struct.unpack("<Q", header[:8])
            if verify:
                (crc,) = struct.unpack("<I", header[8:12])
                if crc != masked_crc(header[:8]):
                    raise ValueError(f"{path}: bad length crc")
            payload = f.read(length)
            footer = f.read(4)
            if len(payload) < length or len(footer) < 4:
                raise ValueError(f"{path}: truncated record")
            if verify:
                (crc,) = struct.unpack("<I", footer)
                if crc != masked_crc(payload):
                    raise ValueError(f"{path}: bad payload crc")
            yield payload


def write_tfrecord(path: str, payloads: Iterator[bytes]) -> int:
    """Write raw payloads as a TFRecord file; returns the record count.

    Uses the native framing/CRC engine when built (native/tfrecord_c.cpp) —
    the python CRC is table-driven but byte-at-a-time, which matters when
    converting datasets with ~10 KB payloads per record.
    """
    from cloudaae_tpu.data import native

    n = 0
    use_native = native.available()
    with open(path, "wb") as f:
        for payload in payloads:
            if use_native:
                f.write(native.frame_record(payload))
            else:
                header = struct.pack("<Q", len(payload))
                f.write(header)
                f.write(struct.pack("<I", masked_crc(header)))
                f.write(payload)
                f.write(struct.pack("<I", masked_crc(payload)))
            n += 1
    return n


# ------------------------------------------------------- protobuf (wire)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _write_varint(out: bytearray, value: int) -> None:
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:
        _, pos = _read_varint(buf, pos)
    elif wire_type == 1:
        pos += 8
    elif wire_type == 2:
        ln, pos = _read_varint(buf, pos)
        pos += ln
    elif wire_type == 5:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire_type}")
    return pos


@dataclass
class Feature:
    """One tf.train.Feature: exactly one of the three lists is non-None."""

    bytes_list: list[bytes] | None = None
    float_list: np.ndarray | None = None
    int64_list: np.ndarray | None = None

    @property
    def kind(self) -> str:
        if self.bytes_list is not None:
            return "bytes"
        if self.float_list is not None:
            return "float"
        return "int64"


def _parse_feature(buf: bytes) -> Feature:
    pos = 0
    feat = Feature()
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        ln, pos = _read_varint(buf, pos)
        sub = buf[pos : pos + ln]
        pos += ln
        if fnum == 1:  # BytesList
            vals, p = [], 0
            while p < len(sub):
                t, p = _read_varint(sub, p)
                if t >> 3 == 1 and t & 7 == 2:
                    n, p = _read_varint(sub, p)
                    vals.append(sub[p : p + n])
                    p += n
                else:
                    p = _skip_field(sub, p, t & 7)
            feat.bytes_list = vals
        elif fnum == 2:  # FloatList
            floats: list[np.ndarray] = []
            p = 0
            while p < len(sub):
                t, p = _read_varint(sub, p)
                if t >> 3 == 1 and t & 7 == 2:  # packed
                    n, p = _read_varint(sub, p)
                    floats.append(np.frombuffer(sub, "<f4", n // 4, p))
                    p += n
                elif t >> 3 == 1 and t & 7 == 5:  # unpacked single
                    floats.append(np.frombuffer(sub, "<f4", 1, p))
                    p += 4
                else:
                    p = _skip_field(sub, p, t & 7)
            feat.float_list = (
                np.concatenate(floats) if floats else np.zeros(0, "<f4")
            )
        elif fnum == 3:  # Int64List
            ints: list[int] = []
            p = 0
            while p < len(sub):
                t, p = _read_varint(sub, p)
                if t >> 3 == 1 and t & 7 == 2:  # packed
                    n, p = _read_varint(sub, p)
                    end = p + n
                    while p < end:
                        v, p = _read_varint(sub, p)
                        ints.append(v)
                elif t >> 3 == 1 and t & 7 == 0:
                    v, p = _read_varint(sub, p)
                    ints.append(v)
                else:
                    p = _skip_field(sub, p, t & 7)
            arr = np.array(ints, np.uint64).astype(np.int64)  # two's complement
            feat.int64_list = arr
        else:
            raise ValueError(f"unknown Feature field {fnum}")
    return feat


def parse_example(payload: bytes) -> dict[str, Feature]:
    """Parse a serialized tf.train.Example into {name: Feature}."""
    pos = 0
    out: dict[str, Feature] = {}
    while pos < len(payload):
        tag, pos = _read_varint(payload, pos)
        if tag >> 3 != 1 or tag & 7 != 2:
            pos = _skip_field(payload, pos, tag & 7)
            continue
        ln, pos = _read_varint(payload, pos)
        features_buf = payload[pos : pos + ln]
        pos += ln
        fpos = 0
        while fpos < len(features_buf):
            ftag, fpos = _read_varint(features_buf, fpos)
            if ftag >> 3 != 1 or ftag & 7 != 2:
                fpos = _skip_field(features_buf, fpos, ftag & 7)
                continue
            entry_len, fpos = _read_varint(features_buf, fpos)
            entry = features_buf[fpos : fpos + entry_len]
            fpos += entry_len
            # map entry: key=1 (string), value=2 (Feature)
            name, feat = None, None
            ep = 0
            while ep < len(entry):
                etag, ep = _read_varint(entry, ep)
                if etag >> 3 == 1 and etag & 7 == 2:
                    n, ep = _read_varint(entry, ep)
                    name = entry[ep : ep + n].decode()
                    ep += n
                elif etag >> 3 == 2 and etag & 7 == 2:
                    n, ep = _read_varint(entry, ep)
                    feat = _parse_feature(entry[ep : ep + n])
                    ep += n
                else:
                    ep = _skip_field(entry, ep, etag & 7)
            if name is not None and feat is not None:
                out[name] = feat
    return out


def _encode_feature(feat: Feature) -> bytes:
    inner = bytearray()
    if feat.bytes_list is not None:
        sub = bytearray()
        for b in feat.bytes_list:
            _write_varint(sub, (1 << 3) | 2)
            _write_varint(sub, len(b))
            sub.extend(b)
        _write_varint(inner, (1 << 3) | 2)
        _write_varint(inner, len(sub))
        inner.extend(sub)
    elif feat.float_list is not None:
        data = np.asarray(feat.float_list, "<f4").tobytes()
        sub = bytearray()
        _write_varint(sub, (1 << 3) | 2)
        _write_varint(sub, len(data))
        sub.extend(data)
        _write_varint(inner, (2 << 3) | 2)
        _write_varint(inner, len(sub))
        inner.extend(sub)
    elif feat.int64_list is not None:
        sub = bytearray()
        packed = bytearray()
        for v in np.asarray(feat.int64_list).tolist():
            _write_varint(packed, v & 0xFFFFFFFFFFFFFFFF)
        _write_varint(sub, (1 << 3) | 2)
        _write_varint(sub, len(packed))
        sub.extend(packed)
        _write_varint(inner, (3 << 3) | 2)
        _write_varint(inner, len(sub))
        inner.extend(sub)
    return bytes(inner)


def example_bytes(features: dict[str, Feature | np.ndarray | list | bytes]) -> bytes:
    """Serialize {name: Feature-or-array} to tf.train.Example wire bytes.

    Convenience coercions: float arrays -> FloatList, int arrays ->
    Int64List, bytes -> BytesList.
    """
    entries = bytearray()
    for name, value in features.items():
        if not isinstance(value, Feature):
            if isinstance(value, bytes):
                value = Feature(bytes_list=[value])
            else:
                arr = np.asarray(value)
                if np.issubdtype(arr.dtype, np.floating):
                    value = Feature(float_list=arr.ravel())
                else:
                    value = Feature(int64_list=arr.ravel())
        fbytes = _encode_feature(value)
        entry = bytearray()
        key = name.encode()
        _write_varint(entry, (1 << 3) | 2)
        _write_varint(entry, len(key))
        entry.extend(key)
        _write_varint(entry, (2 << 3) | 2)
        _write_varint(entry, len(fbytes))
        entry.extend(fbytes)
        _write_varint(entries, (1 << 3) | 2)
        _write_varint(entries, len(entry))
        entries.extend(entry)
    out = bytearray()
    _write_varint(out, (1 << 3) | 2)
    _write_varint(out, len(entries))
    out.extend(entries)
    return bytes(out)
