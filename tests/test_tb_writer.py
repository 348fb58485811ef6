"""TensorBoard event-writer tests: verify the hand-encoded TFRecord + proto
bytes parse back correctly (framing, CRCs, varints incl. negatives)."""

import os
import struct

import numpy as np
import pytest

from rot_mvgaze_tpu.train.tb import (
    SummaryWriter,
    _masked_crc,
    _varint,
    crc32c,
    make_image_grid,
)


def read_records(path):
    records = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        (length,) = struct.unpack_from("<Q", data, pos)
        (len_crc,) = struct.unpack_from("<I", data, pos + 8)
        assert len_crc == _masked_crc(data[pos : pos + 8]), "length crc"
        payload = data[pos + 12 : pos + 12 + length]
        (crc,) = struct.unpack_from("<I", data, pos + 12 + length)
        assert crc == _masked_crc(payload), "payload crc"
        records.append(payload)
        pos += 12 + length + 4
    return records


def decode_varint(buf, pos):
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


class TestCrc32c:
    def test_known_vectors(self):
        # standard CRC32C test vectors
        assert crc32c(b"") == 0x00000000
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"a") == 0xC1D04330


class TestVarint:
    def test_small(self):
        assert _varint(0) == b"\x00"
        assert _varint(1) == b"\x01"
        assert _varint(300) == b"\xac\x02"

    def test_negative_two_complement(self):
        # protobuf int64 -1 encodes as ten 0xff bytes ending in 0x01
        enc = _varint(-1)
        assert len(enc) == 10
        val, _ = decode_varint(enc, 0)
        assert val == (1 << 64) - 1

    def test_negative_terminates(self):
        # regression: python arithmetic shift made this loop forever
        for v in (-1, -5, -1000):
            assert len(_varint(v)) == 10


class TestSummaryWriter:
    def test_filename_unique_per_process(self, tmp_path):
        # two writers on one log dir in the same epoch-second (the
        # multi-process single-host case) must NOT append to one file —
        # interleaved TFRecords CRC-fail and TensorBoard silently drops
        # everything after the first mismatch. pid in the filename (as
        # torch does) keeps them apart; same-process writers rely on it too.
        import os

        w1 = SummaryWriter(str(tmp_path))
        w2 = SummaryWriter(str(tmp_path))
        w1.add_scalar("a", 1.0, 0)
        w2.add_scalar("a", 2.0, 0)
        w1.close()
        w2.close()
        files = sorted(os.listdir(tmp_path))
        # pid + per-process uid => two distinct files, never one shared
        assert len(files) == 2, files
        assert all(f".{os.getpid()}." in f for f in files)

    def test_file_parses_with_valid_crcs(self, tmp_path):
        w = SummaryWriter(str(tmp_path))
        w.add_scalar("test/error", 42.5, step=3)
        w.add_scalar("test/error", 41.0, step=-1)  # pre-train eval step
        img = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
        w.add_image("test/img", img, step=1)
        w.close()
        files = [f for f in os.listdir(tmp_path) if f.startswith("events")]
        assert len(files) == 1
        records = read_records(os.path.join(tmp_path, files[0]))
        # file_version event + 2 scalars + 1 image
        assert len(records) == 4
        # first record carries the brain.Event:2 version marker
        assert b"brain.Event:2" in records[0]
        assert b"test/error" in records[1]
        # image record embeds a PNG
        assert b"\x89PNG" in records[3]

    def test_scalar_value_roundtrip(self, tmp_path):
        w = SummaryWriter(str(tmp_path))
        w.add_scalar("x", 1.25, step=7)
        w.close()
        fname = [f for f in os.listdir(tmp_path) if f.startswith("events")][0]
        rec = read_records(os.path.join(tmp_path, fname))[1]
        # float 1.25 little-endian must appear in the summary bytes
        assert struct.pack("<f", 1.25) in rec


class TestImageGrid:
    def test_grid_shape(self):
        imgs = np.random.default_rng(0).random((6, 10, 12, 3))
        grid = make_image_grid(imgs, nrow=4, pad=2)
        assert grid.shape == (2 * 12 + 2, 4 * 14 + 2, 3)
        assert grid.min() >= 0.0 and grid.max() <= 1.0

    def test_normalizes_to_unit_range(self):
        imgs = np.full((2, 4, 4, 3), -5.0)
        imgs[0, 0, 0, 0] = 5.0
        grid = make_image_grid(imgs)
        assert grid.max() <= 1.0 and grid.min() >= 0.0
