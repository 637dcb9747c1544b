"""Preprocessing tests: native tfrecord/Example parsing, MMNIST test-set CLI."""

import gzip
import struct

import numpy as np


def _varint(n):
    n &= (1 << 64) - 1  # two's-complement encoding for negative int64
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            out += bytes([b7])
            return out


def _ld(field, payload):
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _encode_example(features):
    """Independent tf.train.Example encoder for testing the parser."""
    entries = b""
    for key, value in features.items():
        if isinstance(value[0], bytes):
            lst = b"".join(_ld(1, v) for v in value)
            feature = _ld(1, lst)  # BytesList
        elif isinstance(value[0], float):
            packed = struct.pack(f"<{len(value)}f", *value)
            feature = _ld(2, _ld(1, packed))  # FloatList packed
        else:
            packed = b"".join(_varint(v) for v in value)
            feature = _ld(3, _ld(1, packed))  # Int64List packed
        entry = _ld(1, key.encode()) + _ld(2, feature)
        entries += _ld(1, entry)
    return _ld(1, entries)  # Example.features


def _write_tfrecord(path, payloads):
    with open(path, "wb") as f:
        for p in payloads:
            f.write(struct.pack("<Q", len(p)))
            f.write(b"\x00" * 4)
            f.write(p)
            f.write(b"\x00" * 4)


class TestTFRecordReader:
    def test_roundtrip(self, tmp_path):
        from preprocessing.bair.tfrecord_reader import (
            parse_example, tfrecord_iterator)
        ex1 = _encode_example({
            "0/image_aux1/encoded": [b"\x01\x02\x03" * 4096],
            "scores": [1.5, -2.0],
            "ids": [7, 300, -1],
        })
        ex2 = _encode_example({"0/image_aux1/encoded": [b"xyz"]})
        path = tmp_path / "rec.tfrecord"
        _write_tfrecord(path, [ex1, ex2])

        records = list(tfrecord_iterator(str(path)))
        assert len(records) == 2
        parsed = parse_example(records[0])
        assert parsed["0/image_aux1/encoded"][0] == b"\x01\x02\x03" * 4096
        assert parsed["scores"] == [1.5, -2.0]
        assert parsed["ids"] == [7, 300, -1]  # negative int64 sign-decodes
        assert parse_example(records[1])["0/image_aux1/encoded"][0] == b"xyz"


class TestMMNISTTestSet:
    def test_cli_output_loadable(self, tmp_path, monkeypatch):
        # fake MNIST test IDX files (16 tiny digits + labels)
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 255, (16, 28, 28)).astype(np.uint8)
        with gzip.open(tmp_path / "t10k-images-idx3-ubyte.gz", "wb") as f:
            f.write(struct.pack(">IIII", 2051, 16, 28, 28) + imgs.tobytes())
        with gzip.open(tmp_path / "t10k-labels-idx1-ubyte.gz", "wb") as f:
            f.write(struct.pack(">II", 2049, 16)
                    + rng.randint(0, 10, 16).astype(np.uint8).tobytes())

        from preprocessing.mmnist import make_test_set
        args = type("A", (), dict(data_dir=str(tmp_path), seq_len=7, seed=42,
                                  deterministic=False, digits=2, frame_size=64,
                                  max_speed=4))
        make_test_set.main(args)

        arc = np.load(tmp_path / "smmnist_test_2digits_64.npz")
        assert arc["sequences"].shape == (7, 8, 64, 64)   # (T, N, H, W)
        assert arc["latents"].shape[0] == 7               # (T, N, digits, 4)
        assert arc["labels"].shape == (8, 2)
        # the produced file loads through the dataset registry
        from srvp_tpu.data.mmnist import MovingMNIST
        ds = MovingMNIST.make_dataset(str(tmp_path), 64, 7, 4, False, 2,
                                      train=False)
        assert len(ds) == 8
        assert ds.get_item(0, None).shape == (7, 64, 64)
