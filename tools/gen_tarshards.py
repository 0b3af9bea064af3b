#!/usr/bin/env python3
"""Generate the committed TAR-shard fixtures.

fixtures/tarshard/ — entry-level law (q_src_tar_digest):
WebDataset-style training shards — 2 archives x 10 law-determined
entries. Entry (s, i): name doc_{s}_{i:03d}.txt, length 64 + 16*i +
8*s, byte j = (7*j + 13*i + 19*s) % 251. The law is pure arithmetic,
so the q_src_tar_digest oracle replays every census (length, nonzero
count, byte sum, position-weighted checksum) from generate_series —
independent of the engine's ustar parser. Deterministic output: fixed
mtimes, uid/gid 0, ustar format.

fixtures/tarshard/samples/ — sample-assembly law (q_src_tar_samples):
2 archives x 6 multi-entry SAMPLES. Sample (s, m): key k{s}_{mm} for
m < 5, and for m == 5 the key is k{s}_05_ + 'x'*110 (116 chars — over
the 100-byte ustar name field, forcing a PAX 'x' path record in
sample-000.tar / a GNU 'L' long-name entry in sample-001.tar, so the
oracle gate exercises the long-name parser paths, not just a spec).
Entries in order: .img (ei=0), .json (ei=1), and .txt (ei=2) iff
m % 2 == 0. Entry length 48 + 8*m + 4*ei + 2*s, byte
j = (5*j + 11*m + 23*s + 31*ei) % 251. Pure arithmetic again: the
oracle replays key, entry count, ext list, byte total and the
ext-salted checksum from generate_series.
"""
import io
import os
import sys
import tarfile

OUT = sys.argv[1] if len(sys.argv) > 1 else "fixtures/tarshard"


def content(s: int, i: int) -> bytes:
    n = 64 + 16 * i + 8 * s
    return bytes((7 * j + 13 * i + 19 * s) % 251 for j in range(n))


def sample_key(s: int, m: int) -> str:
    if m == 5:
        return f"k{s}_05_" + "x" * 110
    return f"k{s}_{m:02d}"


def sample_content(s: int, m: int, ei: int) -> bytes:
    n = 48 + 8 * m + 4 * ei + 2 * s
    return bytes((5 * j + 11 * m + 23 * s + 31 * ei) % 251 for j in range(n))


def add(tf: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(data)
    info.mtime = 1700000000
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tf.addfile(info, io.BytesIO(data))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for s in range(2):
        path = os.path.join(OUT, f"shard-{s:03d}.tar")
        with tarfile.open(path, "w", format=tarfile.USTAR_FORMAT) as tf:
            for i in range(10):
                add(tf, f"doc_{s}_{i:03d}.txt", content(s, i))
        print(path, os.path.getsize(path))

    sdir = os.path.join(OUT, "samples")
    os.makedirs(sdir, exist_ok=True)
    formats = [tarfile.PAX_FORMAT, tarfile.GNU_FORMAT]
    for s in range(2):
        path = os.path.join(sdir, f"sample-{s:03d}.tar")
        with tarfile.open(path, "w", format=formats[s]) as tf:
            for m in range(6):
                key = sample_key(s, m)
                exts = ["img", "json"] + (["txt"] if m % 2 == 0 else [])
                for ei, ext in enumerate(exts):
                    add(tf, f"{key}.{ext}", sample_content(s, m, ei))
        print(path, os.path.getsize(path))


if __name__ == "__main__":
    main()
