"""The unrolled Hilbert step chain must equal the canonical xy2d loop for
every point of the grid, and the resulting key must be a bijection (a
layout key that collides or skips values silently breaks file sizing)."""

from __future__ import annotations

from pdf_craft_spark.queries.indexing import HBITS, HN, _hilbert_step


def _canonical(x: int, y: int) -> int:
    d, s = 0, HN // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = HN - 1 - x, HN - 1 - y
            x, y = y, x
        s //= 2
    return d


def _stepped(x: int, y: int) -> int:
    # evaluate the generated per-step expressions exactly as SQL would
    d = 0
    for b in range(HBITS - 1, -1, -1):
        s = 1 << b
        rx = (x >> b) & 1
        ry = (y >> b) & 1
        nd = d + s * s * ((3 * rx) ^ ry)
        nx = ((HN - 1 - y) if rx == 1 else y) if ry == 0 else x
        ny = ((HN - 1 - x) if rx == 1 else x) if ry == 0 else y
        d, x, y = nd, nx, ny
    return d


def test_step_chain_matches_canonical_and_is_bijective():
    seen = set()
    # full grid is 65536 points at HBITS=8 — sample every 3rd row/col for
    # speed plus the full lowest 32x32 corner for the bijection check
    for x in range(0, HN, 3):
        for y in range(0, HN, 3):
            assert _stepped(x, y) == _canonical(x, y)
    for x in range(32):
        for y in range(32):
            d = _stepped(x, y)
            assert d == _canonical(x, y)
            assert d not in seen
            seen.add(d)


def test_unit_steps_are_spatial_neighbors():
    # Hilbert's defining property (and its advantage over Morton): every
    # consecutive key pair is an orthogonal unit step in (x, y) space.
    inv = {}
    for x in range(64):
        for y in range(64):
            inv[_canonical(x, y)] = (x, y)
    ds = sorted(k for k in inv if k + 1 in inv)
    for k in ds[:2000]:
        (x1, y1), (x2, y2) = inv[k], inv[k + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_sql_renderers_agree_shapes():
    for b in (0, 3, HBITS - 1):
        ds, nxs, nys = _hilbert_step(b, "spark")
        dd, nxd, nyd = _hilbert_step(b, "duck")
        assert "^" in ds and "xor(" in dd
        assert nxs == nxd and nys == nyd
