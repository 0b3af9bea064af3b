#!/usr/bin/env python3
"""Independent TIFF digest for the q_src_tiff_digest oracle.

Decodes the committed fixtures/tiff planes with a raw IFD walk (byte
order from the header, width/height/bits/compression/sample-format
tags, strip offsets + byte counts, numpy frombuffer) — sharing zero
code with the engine's JDK ImageIO path — and prints the exact census
rows pinned in IoQueries.oracles. Re-run after changing the fixtures:

    python3 tools/tiff_digest.py [fixtures/tiff]

Only uncompressed single-plane TIFFs are supported (which the fixtures
are: 512x512 int16, one strip set, compression=1).
"""
import glob
import struct
import sys

import numpy as np

P = 1000000007


def digest(path):
    d = open(path, 'rb').read()
    bo = '<' if d[:2] == b'II' else '>'
    _, off = struct.unpack(bo + 'HI', d[2:8])
    n = struct.unpack(bo + 'H', d[off:off + 2])[0]
    tags = {}
    for i in range(n):
        t, typ, cnt, val = struct.unpack(
            bo + 'HHII', d[off + 2 + i * 12:off + 2 + (i + 1) * 12])
        tags[t] = (typ, cnt, val)
    w, h = tags[256][2], tags[257][2]
    bps = tags.get(258, (0, 0, 8))[2]
    comp = tags.get(259, (0, 0, 1))[2]
    fmt = tags.get(339, (0, 0, 1))[2]
    assert comp == 1, f'{path}: compressed TIFF not supported'

    def arr(tag):
        typ, cnt, val = tags[tag]
        sz = {3: 2, 4: 4}[typ]
        if cnt * sz <= 4:
            return [val]
        fmtc = {3: 'H', 4: 'I'}[typ]
        return list(struct.unpack(bo + str(cnt) + fmtc,
                                  d[val:val + cnt * sz]))

    raw = b''.join(d[o:o + c] for o, c in zip(arr(273), arr(279)))
    dt = {(16, 1): bo + 'u2', (16, 2): bo + 'i2',
          (32, 3): bo + 'f4', (32, 1): bo + 'u4', (8, 1): 'u1'}[(bps, fmt)]
    v = np.rint(np.frombuffer(raw, dtype=dt).astype(np.float64)).astype(np.int64)
    assert len(v) == w * h, f'{path}: strip bytes do not cover one plane'
    idx = np.arange(1, len(v) + 1, dtype=np.int64)
    chk = int(np.sum((idx * v) % P) % P)
    return h, w, int((v != 0).sum()), int(v.sum()), int(v.max()), chk


if __name__ == '__main__':
    base = sys.argv[1] if len(sys.argv) > 1 else 'fixtures/tiff'
    for f in sorted(glob.glob(f'{base}/*.tif')):
        name = f.split('/')[-1].rsplit('.', 1)[0]
        h, w, nnz, s, mx, chk = digest(f)
        print(f"('{name}', 0, {h}, {w}, {nnz}, {s}, {mx}, {chk}),")
