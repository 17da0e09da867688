"""Minimal Kaldi ark/scp matrix and vector I/O.

Compact replacement for the reference's vendored kaldi_io
(reference: chunkformer/dataset/kaldi_io.py — vestigial in the main path but
part of the public surface): binary-mode float matrix/vector read/write plus
scp indirection. Covers FM/FV (float32) and DM/DV (float64) headers.
"""

from __future__ import annotations

import struct
from typing import Iterator, Tuple

import numpy as np


def _read_token(f) -> str:
    tok = b""
    while True:
        ch = f.read(1)
        if not ch or ch == b" ":
            break
        tok += ch
    return tok.decode()


def read_mat(f) -> np.ndarray:
    """Read one binary-mode matrix/vector at the current position."""
    binary = f.read(2)
    assert binary == b"\0B", f"only binary kaldi format supported, got {binary!r}"
    header = _read_token(f)
    if header in ("FM", "DM"):
        dtype = np.float32 if header == "FM" else np.float64
        assert f.read(1) == b"\x04"
        rows = struct.unpack("<i", f.read(4))[0]
        assert f.read(1) == b"\x04"
        cols = struct.unpack("<i", f.read(4))[0]
        data = np.frombuffer(f.read(rows * cols * dtype().itemsize), dtype=dtype)
        return data.reshape(rows, cols)
    if header in ("FV", "DV"):
        dtype = np.float32 if header == "FV" else np.float64
        assert f.read(1) == b"\x04"
        dim = struct.unpack("<i", f.read(4))[0]
        return np.frombuffer(f.read(dim * dtype().itemsize), dtype=dtype)
    raise ValueError(f"unsupported kaldi header {header}")


def read_ark(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate (key, matrix) pairs from a binary ark file."""
    with open(path, "rb") as f:
        while True:
            key = b""
            while True:
                ch = f.read(1)
                if not ch:
                    return
                if ch == b" ":
                    break
                key += ch
            yield key.decode(), read_mat(f)


def read_scp(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate (key, matrix) via `key ark_path:offset` lines."""
    with open(path, encoding="utf-8") as f:
        for line in f:
            key, rxfile = line.strip().split(maxsplit=1)
            ark, _, offset = rxfile.rpartition(":")
            with open(ark, "rb") as af:
                af.seek(int(offset))
                yield key, read_mat(af)


def write_ark(path: str, items, scp_path: str = None):
    """Write (key, float32 matrix|vector) pairs as binary ark [+ scp index]."""
    scp = open(scp_path, "w") if scp_path else None
    with open(path, "wb") as f:
        for key, mat in items:
            f.write(key.encode() + b" ")
            offset = f.tell()
            mat = np.asarray(mat, np.float32)
            f.write(b"\0B")
            if mat.ndim == 2:
                f.write(b"FM \x04" + struct.pack("<i", mat.shape[0])
                        + b"\x04" + struct.pack("<i", mat.shape[1]))
            else:
                f.write(b"FV \x04" + struct.pack("<i", mat.shape[0]))
            f.write(mat.tobytes())
            if scp:
                scp.write(f"{key} {path}:{offset}\n")
    if scp:
        scp.close()
