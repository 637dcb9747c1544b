"""Minimal native TFRecord + tf.train.Example reader (no TensorFlow needed).

The reference BAIR converter requires TensorFlow 1.x just to iterate
tfrecords (/root/reference/preprocessing/bair/convert.py). This module
parses the two formats directly:

  * TFRecord framing: per record, little-endian uint64 length, masked-crc32
    of the length, payload, masked-crc32 of the payload (CRCs unchecked)
  * tf.train.Example protobuf wire format:
      Example{1: Features{1: repeated map entry {1: key, 2: Feature}}},
      Feature{1: BytesList, 2: FloatList, 3: Int64List}, each list with
      repeated field 1
"""

import struct


def _read_varint(buf, pos):
    result, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf, start, end):
    """Yields (field_number, wire_type, value) over a protobuf message."""
    pos = start
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:        # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:      # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:      # length-delimited
            n, pos = _read_varint(buf, pos)
            val = (pos, pos + n)
            pos += n
        elif wire == 5:      # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _parse_bytes_list(buf, span):
    return [buf[s:e] for f, w, (s, e) in _iter_fields(buf, *span) if f == 1]


def _parse_float_list(buf, span):
    out = []
    for f, w, val in _iter_fields(buf, *span):
        if f != 1:
            continue
        if w == 2:  # packed
            s, e = val
            out.extend(struct.unpack(f"<{(e - s) // 4}f", buf[s:e]))
        else:
            out.append(struct.unpack("<f", val)[0])
    return out


def _parse_int64_list(buf, span):
    def signed(v):
        # int64 protobuf varints are two's-complement in 64 bits; fold the
        # raw magnitude back into the signed range so e.g. -1 does not
        # surface as 2^64 - 1
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= (1 << 63) else v

    out = []
    for f, w, val in _iter_fields(buf, *span):
        if f != 1:
            continue
        if w == 2:  # packed
            s, e = val
            pos = s
            while pos < e:
                v, pos = _read_varint(buf, pos)
                out.append(signed(v))
        else:
            out.append(signed(val))
    return out


def parse_example(buf):
    """Serialized tf.train.Example -> {key: list-of-bytes/floats/ints}."""
    features = {}
    for f, _, span in _iter_fields(buf, 0, len(buf)):
        if f != 1:  # Example.features
            continue
        for f2, _, entry_span in _iter_fields(buf, *span):
            if f2 != 1:  # Features.feature map entries
                continue
            key, value = None, None
            for f3, _, v in _iter_fields(buf, *entry_span):
                if f3 == 1:
                    s, e = v
                    key = buf[s:e].decode("utf-8")
                elif f3 == 2:
                    value = v
            if key is None or value is None:
                continue
            parsed = None
            for f4, _, v in _iter_fields(buf, *value):
                if f4 == 1:
                    parsed = _parse_bytes_list(buf, v)
                elif f4 == 2:
                    parsed = _parse_float_list(buf, v)
                elif f4 == 3:
                    parsed = _parse_int64_list(buf, v)
            features[key] = parsed
    return features


def tfrecord_iterator(path):
    """Yields raw record payloads from a TFRecord file."""
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            f.read(4)  # length crc
            payload = f.read(length)
            if len(payload) < length:
                return
            f.read(4)  # payload crc
            yield payload
