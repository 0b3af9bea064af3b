#!/usr/bin/env python3
"""Generate the committed TAR-shard fixture (fixtures/tarshard/):
WebDataset-style training shards — 2 archives x 10 law-determined
entries. Entry (s, i): name doc_{s}_{i:03d}.txt, length 64 + 16*i +
8*s, byte j = (7*j + 13*i + 19*s) % 251. The law is pure arithmetic,
so the q_src_tar_digest oracle replays every census (length, nonzero
count, byte sum, position-weighted checksum) from generate_series —
independent of the engine's ustar parser. Deterministic output: fixed
mtimes, uid/gid 0, ustar format.
"""
import io
import os
import sys
import tarfile

OUT = sys.argv[1] if len(sys.argv) > 1 else "fixtures/tarshard"


def content(s: int, i: int) -> bytes:
    n = 64 + 16 * i + 8 * s
    return bytes((7 * j + 13 * i + 19 * s) % 251 for j in range(n))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for s in range(2):
        path = os.path.join(OUT, f"shard-{s:03d}.tar")
        with tarfile.open(path, "w", format=tarfile.USTAR_FORMAT) as tf:
            for i in range(10):
                data = content(s, i)
                info = tarfile.TarInfo(name=f"doc_{s}_{i:03d}.txt")
                info.size = len(data)
                info.mtime = 1700000000
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
        print(path, os.path.getsize(path))


if __name__ == "__main__":
    main()
