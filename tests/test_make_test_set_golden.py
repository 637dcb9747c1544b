"""make_test_set CLI golden parity against the reference pipeline.

The fixture (tests/golden/mmnist_testset_golden.npz) was produced by running
the reference's test-set generation semantics as an oracle on synthetic
digit images. Our CLI, fed the same digits via fake MNIST IDX files, must
reproduce every output array bit-for-bit (same seed-42 permutation, same
trajectory draw order, same npz layout)."""

import gzip
import os
import struct

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "mmnist_testset_golden.npz")


def test_make_test_set_bit_parity(tmp_path):
    arc = np.load(GOLDEN)
    imgs, labels = arc["mnist_imgs"], arc["mnist_labels"]
    with gzip.open(tmp_path / "t10k-images-idx3-ubyte.gz", "wb") as f:
        f.write(struct.pack(">IIII", 2051, len(imgs), 28, 28) + imgs.tobytes())
    with gzip.open(tmp_path / "t10k-labels-idx1-ubyte.gz", "wb") as f:
        f.write(struct.pack(">II", 2049, len(labels)) + labels.tobytes())

    from preprocessing.mmnist import make_test_set
    args = type("A", (), dict(data_dir=str(tmp_path), seq_len=9, seed=42,
                              deterministic=False, digits=2, frame_size=64,
                              max_speed=4))
    make_test_set.main(args)

    out = np.load(tmp_path / "smmnist_test_2digits_64.npz")
    np.testing.assert_array_equal(out["sequences"], arc["sequences"])
    np.testing.assert_array_equal(out["latents"], arc["latents"])
    np.testing.assert_array_equal(out["labels"], arc["out_labels"])
    np.testing.assert_array_equal(out["digits"], arc["out_digits"])
