"""Pure-Python S2 cell reference twin — used ONLY by tests to
validate the translator's SQL-fold emission of geo_point_to_s2cell /
geo_s2cell_to_central_point over random points and anchor vectors.

Implements the publicly-specified S2 cell-ID scheme (S2 geometry:
quadratic ST projection + Hilbert curve over each cube face;
http://s2geometry.io/devguide/s2cell_hierarchy): 3 face bits, 60
Hilbert-position bits (2/level), trailing lsb marker; token = 16-hex
of the unsigned id with trailing zeros stripped. Written from the
public algorithm description, 2 bits per step (no 4-bit lookup
compression — the tables below are the canonical 4-entry Hilbert
traversal orders and orientation masks).
"""

from __future__ import annotations

import math

SWAP = 1
INVERT = 2
# canonical Hilbert sub-cell traversal: POS_TO_IJ[orientation][pos]
# = ij (i<<1|j) of the pos-th visited sub-cell
POS_TO_IJ = [
    [0, 1, 3, 2],
    [0, 2, 3, 1],
    [3, 2, 0, 1],
    [3, 1, 0, 2],
]
IJ_TO_POS = [
    [0, 1, 3, 2],
    [0, 3, 1, 2],
    [2, 3, 1, 0],
    [2, 1, 3, 0],
]
POS_TO_ORIENTATION = [SWAP, 0, 0, INVERT | SWAP]
MAX_SIZE = 1 << 30


def _xyz(lng_deg: float, lat_deg: float):
    phi = math.radians(lat_deg)
    theta = math.radians(lng_deg)
    c = math.cos(phi)
    return c * math.cos(theta), c * math.sin(theta), math.sin(phi)


def _face(x, y, z) -> int:
    if abs(x) > abs(y):
        f = 0 if abs(x) > abs(z) else 2
    else:
        f = 1 if abs(y) > abs(z) else 2
    if (x, y, z)[f] < 0:
        f += 3
    return f


def _face_uv(face, x, y, z):
    if face == 0:
        return y / x, z / x
    if face == 1:
        return -x / y, z / y
    if face == 2:
        return -x / z, -y / z
    if face == 3:
        return z / x, y / x
    if face == 4:
        return z / y, -x / y
    return -y / z, -x / z


def _st(u: float) -> float:
    # quadratic projection (S2_QUADRATIC_PROJECTION)
    if u >= 0:
        return 0.5 * math.sqrt(1 + 3 * u)
    return 1 - 0.5 * math.sqrt(1 - 3 * u)


def _st_inv(s: float) -> float:
    if s >= 0.5:
        return (4 * s * s - 1) / 3
    return (1 - 4 * (1 - s) * (1 - s)) / 3


def _st_to_ij(s: float) -> int:
    return max(0, min(MAX_SIZE - 1, int(math.floor(MAX_SIZE * s))))


def point_to_cell_id(lng: float, lat: float, level: int = 11) -> int:
    x, y, z = _xyz(lng, lat)
    face = _face(x, y, z)
    u, v = _face_uv(face, x, y, z)
    i, j = _st_to_ij(_st(u)), _st_to_ij(_st(v))
    o = face & SWAP
    pos = 0
    for k in range(29, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        p = IJ_TO_POS[o][ij]
        pos = pos * 4 + p
        o ^= POS_TO_ORIENTATION[p]
    leaf = (face << 61) | (pos << 1) | 1
    lsb = 1 << (2 * (30 - level))
    return (leaf & ~(2 * lsb - 1)) | lsb


def token(cell_id: int) -> str:
    return format(cell_id, "016x").rstrip("0") or "0"


def point_to_token(lng: float, lat: float, level: int = 11) -> str:
    return token(point_to_cell_id(lng, lat, level))


def token_to_center(tok: str):
    """token -> (lng, lat) of the cell center; None on invalid."""
    if not tok or len(tok) > 16 or any(
        c not in "0123456789abcdefABCDEF" for c in tok
    ):
        return None
    cid = int(tok.ljust(16, "0"), 16)
    if cid == 0:
        return None
    face = cid >> 61
    if face > 5:
        return None
    tz = (cid & -cid).bit_length() - 1
    if tz % 2 != 0 or tz > 60:
        return None
    pf = (cid >> 1) & ((1 << 60) - 1)
    i = j = 0
    o = face & SWAP
    for k in range(29, -1, -1):
        q = (pf >> (2 * k)) & 3
        ij = POS_TO_IJ[o][q]
        i |= (ij >> 1) << k
        j |= (ij & 1) << k
        o ^= POS_TO_ORIENTATION[q]
    if cid & 1:
        delta = 1
    elif (i ^ (cid >> 2)) & 1:
        delta = 2
    else:
        delta = 0
    s = (2 * i + delta) / (2.0 * MAX_SIZE)
    t = (2 * j + delta) / (2.0 * MAX_SIZE)
    u, v = _st_inv(s), _st_inv(t)
    xyz = [
        (1.0, u, v),
        (-u, 1.0, v),
        (-u, -v, 1.0),
        (-1.0, -v, -u),
        (v, -1.0, -u),
        (v, u, -1.0),
    ][face]
    x, y, z = xyz
    lng = math.degrees(math.atan2(y, x))
    lat = math.degrees(math.atan2(z, math.hypot(x, y)))
    return lng, lat
