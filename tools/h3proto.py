#!/usr/bin/env python3
"""Prototype of geodetic H3 derivation, to be ported to Scala once the
pinned reference vector passes. Constants are the published Uber H3
icosahedron orientation (public spec); everything else is derived.
"""
import math

EPS = 1e-16
M_SQRT7 = math.sqrt(7.0)
RES0_U = 0.38196601125010500003  # res-0 unit gnomonic length = tan(theta_vertex)/2
AP7_ROT = math.asin(math.sqrt(3.0 / 28.0))
SIN60 = math.sqrt(3.0) / 2.0

# faceCenterGeo: (lat, lon) radians, H3 orientation (public h3 spec data).
FACE_CENTER_GEO = [
    (0.803582649718989942, 1.248397419617396099),
    (1.307747883455638156, 2.536945009877921159),
    (1.054751253523952054, -1.347517358900396623),
    (0.600191595538186799, -0.450603909469755746),
    (0.491715428198773866, 0.401988202911306943),
    (0.172745327415618701, 1.678146885280433686),
    (0.605929321571350690, 2.953923329812411617),
    (0.427370518328979641, -1.888876200336285401),
    (-0.079066118549212831, -0.733429513380867741),
    (-0.230961644455383637, 0.506495587332349035),
    (0.079066118549212831, 2.408163140208925497),
    (0.230961644455383637, -2.635097066257444203),
    (-0.172745327415618701, -1.463445768309359553),
    (-0.605929321571350690, -0.187669323777381622),
    (-0.427370518328979641, 1.252716453253507838),
    (-0.600191595538186799, 2.690988744120037492),
    (-0.491715428198773866, -2.739604450678486295),
    (-0.803582649718989942, -1.893195233972397139),
    (-1.307747883455638156, -0.604647643711872080),
    (-1.054751253523952054, 1.794075294689396615),
]

# faceAxesAzRadsCII[face][0] (i-axis azimuth); j = i - 2pi/3, k = j - 2pi/3.
FACE_AX0 = [
    5.619958268523939882,
    5.760339081714187279,
    0.780213654393430055,
    0.430469363979999913,
    6.130269123335111400,
    2.692877706530642877,
    2.982963003477243874,
    3.532912002790141181,
    3.494305004259568154,
    3.003214169499538391,
    5.930472956509811562,
    0.138378484090254847,
    0.448714947059150361,
    0.158629650112549365,
    5.891865957979238535,
    2.711123289609793325,
    3.294508837434268316,
    3.804819692245439833,
    3.664438879055192436,
    2.361378999196363184,
]

PENT_BC = [4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117]


def geo_to_v3(lat, lon):
    r = math.cos(lat)
    return (r * math.cos(lon), r * math.sin(lon), math.sin(lat))


FACE_CENTER_V3 = [geo_to_v3(la, lo) for (la, lo) in FACE_CENTER_GEO]


def sqd(a, b):
    return sum((x - y) ** 2 for x, y in zip(a, b))


def pos_angle(a):
    t = math.fmod(a, 2 * math.pi)
    return t + 2 * math.pi if t < 0 else t


def az_rads(p1, p2):
    (lat1, lon1), (lat2, lon2) = p1, p2
    return math.atan2(
        math.cos(lat2) * math.sin(lon2 - lon1),
        math.cos(lat1) * math.sin(lat2)
        - math.sin(lat1) * math.cos(lat2) * math.cos(lon2 - lon1),
    )


def constrain_lng(l):
    while l > math.pi:
        l -= 2 * math.pi
    while l < -math.pi:
        l += 2 * math.pi
    return l


def az_distance(p1, az, r):
    if r < EPS:
        return p1
    lat1, lon1 = p1
    az = pos_angle(az)
    if az < EPS or abs(az - math.pi) < EPS:
        lat2 = lat1 + r if az < EPS else lat1 - r
        if abs(lat2 - math.pi / 2) < EPS:
            return (math.pi / 2, 0.0)
        if abs(lat2 + math.pi / 2) < EPS:
            return (-math.pi / 2, 0.0)
        return (lat2, constrain_lng(lon1))
    sinlat2 = math.sin(lat1) * math.cos(r) + math.cos(lat1) * math.sin(r) * math.cos(az)
    sinlat2 = max(-1.0, min(1.0, sinlat2))
    lat2 = math.asin(sinlat2)
    if abs(lat2 - math.pi / 2) < EPS:
        return (math.pi / 2, 0.0)
    if abs(lat2 + math.pi / 2) < EPS:
        return (-math.pi / 2, 0.0)
    sinlon = math.sin(az) * math.sin(r) / math.cos(lat2)
    coslon = (math.cos(r) - math.sin(lat1) * sinlat2) / (math.cos(lat1) * math.cos(lat2))
    sinlon = max(-1.0, min(1.0, sinlon))
    coslon = max(-1.0, min(1.0, coslon))
    return (lat2, constrain_lng(lon1 + math.atan2(sinlon, coslon)))


# ---- checks ----
def check_antipodal():
    bad = 0
    for f in range(20):
        la, lo = FACE_CENTER_GEO[f]
        la2, lo2 = FACE_CENTER_GEO[19 - f]
        if abs(la + la2) > 1e-12 or abs(constrain_lng(lo - lo2 - math.pi)) > 1e-12:
            bad += 1
            print("antipodal mismatch", f, 19 - f)
    print("antipodal check:", "OK" if bad == 0 else f"{bad} BAD")


def vertices():
    """60 (face, axis) vertex points; cluster them."""
    theta_v = math.atan(2 * RES0_U)
    pts = []
    for f in range(20):
        for ax in range(3):
            az = FACE_AX0[f] - ax * 2 * math.pi / 3
            p = az_distance(FACE_CENTER_GEO[f], az, theta_v)
            pts.append((f, ax, p))
    # cluster by 3d distance
    clusters = []
    for f, ax, p in pts:
        v = geo_to_v3(*p)
        for c in clusters:
            if sqd(v, c["v"]) < 1e-16:
                c["members"].append((f, ax))
                break
        else:
            clusters.append({"v": v, "p": p, "members": [(f, ax)]})
    sizes = sorted(len(c["members"]) for c in clusters)
    print("vertex clusters:", len(clusters), "sizes:", set(sizes))
    return clusters


if __name__ == "__main__":
    check_antipodal()
    vclusters = vertices()


# ---- ijk / hex2d machinery (public H3 algorithms) ----
def ijk_normalize(c):
    i, j, k = c
    if i < 0:
        j -= i; k -= i; i = 0
    if j < 0:
        i -= j; k -= j; j = 0
    if k < 0:
        i -= k; j -= k; k = 0
    m = min(i, j, k)
    if m > 0:
        i -= m; j -= m; k -= m
    return (i, j, k)


def ijk_to_hex2d(c):
    i = c[0] - c[2]
    j = c[1] - c[2]
    return (i - 0.5 * j, j * SIN60)


def hex2d_to_ijk(v):
    x, y = v
    a1, a2 = abs(x), abs(y)
    x2 = a2 / SIN60
    x1 = a1 + x2 / 2.0
    m1, m2 = int(x1), int(x2)
    r1, r2 = x1 - m1, x2 - m2
    if r1 < 0.5:
        if r1 < 1.0 / 3.0:
            if r2 < (1.0 + r1) / 2.0:
                i, j = m1, m2
            else:
                i, j = m1, m2 + 1
        else:
            j = m2 if r2 < (1.0 - r1) else m2 + 1
            i = m1 + 1 if (1.0 - r1) <= r2 < (2.0 * r1) else m1
    else:
        if r1 < 2.0 / 3.0:
            j = m2 if r2 < (1.0 - r1) else m2 + 1
            i = m1 if (2.0 * r1 - 1.0) < r2 < (1.0 - r1) else m1 + 1
        else:
            if r2 < r1 / 2.0:
                i, j = m1 + 1, m2
            else:
                i, j = m1 + 1, m2 + 1
    k = 0
    if x < 0:
        if j % 2 == 0:
            axisi = j // 2
            diff = i - axisi
            i = i - 2 * diff
        else:
            axisi = (j + 1) // 2
            diff = i - axisi
            i = i - (2 * diff + 1)
    if y < 0:
        i = i - (2 * j + 1) // 2
        j = -j
    return ijk_normalize((i, j, k))


def hex2d_to_geo(v, face, res, substrate):
    x, y = v
    r = math.hypot(x, y)
    if r < EPS:
        return FACE_CENTER_GEO[face]
    theta = math.atan2(y, x)
    for _ in range(res):
        r /= M_SQRT7
    r *= RES0_U
    if substrate:
        r /= 3.0
        if res % 2 == 1:
            r /= M_SQRT7
    r = math.atan(r)
    if (not substrate) and res % 2 == 1:
        theta = pos_angle(theta + AP7_ROT)
    theta = pos_angle(FACE_AX0[face] - theta)
    return az_distance(FACE_CENTER_GEO[face], theta, r)


def geo_to_face(lat, lon):
    v = geo_to_v3(lat, lon)
    best, bsqd = 0, sqd(FACE_CENTER_V3[0], v)
    for f in range(1, 20):
        s = sqd(FACE_CENTER_V3[f], v)
        if s < bsqd:
            best, bsqd = f, s
    return best, bsqd


def geo_to_hex2d(lat, lon, res):
    face, d = geo_to_face(lat, lon)
    r = math.acos(1.0 - d / 2.0)
    if r < EPS:
        return face, (0.0, 0.0)
    theta = pos_angle(
        FACE_AX0[face] - pos_angle(az_rads(FACE_CENTER_GEO[face], (lat, lon)))
    )
    if res % 2 == 1:
        theta = pos_angle(theta - AP7_ROT)
    r = math.tan(r)
    r /= RES0_U
    for _ in range(res):
        r *= M_SQRT7
    return face, (r * math.cos(theta), r * math.sin(theta))


# ---- 122 base cells ----
IN_TRIANGLE = [
    (0, 0, 0),
    (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (1, 1, 0), (0, 1, 1), (1, 0, 1),
    (2, 0, 0), (0, 2, 0), (0, 0, 2),
]


def base_cells():
    coords = []
    for f in range(20):
        for c in IN_TRIANGLE:
            g = hex2d_to_geo(ijk_to_hex2d(c), f, 0, False)
            coords.append((f, c, g, geo_to_v3(*g)))
    clusters = []
    for f, c, g, v in coords:
        for cl in clusters:
            if sqd(v, cl["v"]) < 1e-16:
                cl["members"].append((f, c))
                break
        else:
            clusters.append({"v": v, "g": g, "members": [(f, c)]})
    from collections import Counter
    sizes = Counter(len(cl["members"]) for cl in clusters)
    print("base cell clusters:", len(clusters), "size histogram:", dict(sizes))
    # rank by descending latitude
    order = sorted(range(len(clusters)), key=lambda i: -clusters[i]["g"][0])
    lat_sorted = [clusters[i]["g"][0] for i in order]
    min_gap = min(lat_sorted[i] - lat_sorted[i + 1] for i in range(len(order) - 1))
    print("min latitude gap between consecutive ranks:", min_gap)
    pent_ranks = [r for r, i in enumerate(order)
                  if len(clusters[i]["members"]) == 5]
    print("pentagon ranks:", pent_ranks)
    print("expected      :", PENT_BC)
    print("pentagon rank check:", "OK" if pent_ranks == PENT_BC else "MISMATCH")
    # recall fragments: bc0={f1,(1,0,0)}, bc1={f2,(1,1,0)}, bc2={f1,(0,0,0)},
    # bc3={f2,(1,0,0)}, bc4={f0,(2,0,0)}, bc5={f1,(1,1,0)}
    for rank in range(6):
        cl = clusters[order[rank]]
        print(f"bc{rank}: members={sorted(cl['members'])} "
              f"lat={math.degrees(cl['g'][0]):.3f} lon={math.degrees(cl['g'][1]):.3f}")
    return [clusters[i] for i in order]


if __name__ == "__main__" or True:
    bcs = base_cells()


# ---- home assignment ----
def assign_homes(bcs):
    homes = []
    for rank, cl in enumerate(bcs):
        m = cl["members"]
        if len(m) == 1:
            homes.append(m[0])
        elif len(m) == 2:
            ij = [x for x in m if x[1] == (1, 1, 0)]
            assert len(ij) == 1, f"bc{rank}: edge pair without unique (1,1,0): {m}"
            homes.append(ij[0])
        else:
            f = min(x[0] for x in m)
            c = [x for x in m if x[0] == f]
            assert len(c) == 1
            homes.append(c[0])
    return homes


# ---- digit machinery ----
UNIT_VECS = [(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
             (1, 0, 0), (1, 0, 1), (1, 1, 0)]


def ijk_add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def ijk_sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def ijk_scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def up_ap7(c):
    i = c[0] - c[2]
    j = c[1] - c[2]
    return ijk_normalize((round((3 * i - j) / 7.0), round((i + 2 * j) / 7.0), 0))


def up_ap7r(c):
    i = c[0] - c[2]
    j = c[1] - c[2]
    return ijk_normalize((round((2 * i + j) / 7.0), round((3 * j - i) / 7.0), 0))


def down_ap7(c):
    # iVec {3,0,1} jVec {1,3,0} kVec {0,1,3}
    i = ijk_scale((3, 0, 1), c[0])
    j = ijk_scale((1, 3, 0), c[1])
    k = ijk_scale((0, 1, 3), c[2])
    return ijk_normalize(ijk_add(ijk_add(i, j), k))


def down_ap7r(c):
    # iVec {3,1,0} jVec {0,3,1} kVec {1,0,3}
    i = ijk_scale((3, 1, 0), c[0])
    j = ijk_scale((0, 3, 1), c[1])
    k = ijk_scale((1, 0, 3), c[2])
    return ijk_normalize(ijk_add(ijk_add(i, j), k))


def down_ap3(c):
    # iVec {2,0,1} jVec {1,2,0} kVec {0,1,2}
    i = ijk_scale((2, 0, 1), c[0])
    j = ijk_scale((1, 2, 0), c[1])
    k = ijk_scale((0, 1, 2), c[2])
    return ijk_normalize(ijk_add(ijk_add(i, j), k))


def down_ap3r(c):
    # iVec {2,1,0} jVec {0,2,1} kVec {1,0,2}
    i = ijk_scale((2, 1, 0), c[0])
    j = ijk_scale((0, 2, 1), c[1])
    k = ijk_scale((1, 0, 2), c[2])
    return ijk_normalize(ijk_add(ijk_add(i, j), k))


def ijk_rotate60ccw(c):
    i = ijk_scale((1, 1, 0), c[0])
    j = ijk_scale((0, 1, 1), c[1])
    k = ijk_scale((1, 0, 1), c[2])
    return ijk_normalize(ijk_add(ijk_add(i, j), k))


def ijk_rotate60cw(c):
    i = ijk_scale((1, 0, 1), c[0])
    j = ijk_scale((1, 1, 0), c[1])
    k = ijk_scale((0, 1, 1), c[2])
    return ijk_normalize(ijk_add(ijk_add(i, j), k))


def unit_ijk_to_digit(c):
    n = ijk_normalize(c)
    return UNIT_VECS.index(n) if n in UNIT_VECS else -1


def neighbor(c, digit):
    return ijk_normalize(ijk_add(c, UNIT_VECS[digit]))


# digit rotations: ccw K->IK->I->IJ->J->JK->K
ROT_CCW = {0: 0, 1: 5, 5: 4, 4: 6, 6: 2, 2: 3, 3: 1}
ROT_CW = {v: k for k, v in ROT_CCW.items()}
ROT_CW[0] = 0


def encode_digits(lat, lon, res):
    """geo -> (face, res-0 ijk, digits[res]) without base-cell mapping."""
    face, v = geo_to_hex2d(lat, lon, res)
    ijk = hex2d_to_ijk(v)
    digits = [0] * (res + 1)  # digits[r] for r in 1..res
    for r in range(res, 0, -1):
        last = ijk
        if r % 2 == 1:  # class III
            ijk = up_ap7(ijk)
            center = down_ap7(ijk)
        else:
            ijk = up_ap7r(ijk)
            center = down_ap7r(ijk)
        digits[r] = unit_ijk_to_digit(ijk_sub(last, center))
        assert digits[r] >= 0
    return face, ijk, digits[1:]


HOMES = None
BCS = None


def test_vector():
    global HOMES, BCS
    BCS = base_cells()
    HOMES = assign_homes(BCS)
    lat, lon = math.radians(40.0), math.radians(60.0)
    face, ijk0, digits = encode_digits(lat, lon, 15)
    print("face:", face, "res0 ijk:", ijk0, "digits:", digits)
    # expected cell 0x8f2195c2c540080: bc16, digits from bit field
    exp = 0x8f2195c2c540080
    exp_digits = [(exp >> (3 * (15 - r))) & 0x7 for r in range(1, 16)]
    print("expected bc:", (exp >> 45) & 0x7F, "expected digits:", exp_digits)
    # which bc is (face, ijk0)?
    for rank, cl in enumerate(BCS):
        if (face, ijk0) in cl["members"]:
            print("maps to bc", rank, "home:", HOMES[rank])
            break


# ---- decode ----
MAX_DIM_CII = {0: 2, 2: 14, 4: 98, 6: 686, 8: 4802, 10: 33614,
               12: 235298, 14: 1647086, 16: 11529602}

# derived at runtime: faceNeighbors[face][edge] = (face2, translate, ccwRot60)
# edges: 0=IJ (k==0 side), 1=KI (j==0), 2=JK (i==0)
FACE_NEIGHBORS = None


def vertex_coords_on_faces(bcs):
    """For each vertex cluster (pentagon cell), its coord per face; and for
    each face its 3 vertices as (axis -> cluster)."""
    pass


def derive_face_neighbors(bcs):
    """Fold maps across the 30 edges, from vertex correspondences.

    On face f, edge IJ connects vertices at (2,0,0)*scale (i axis) and
    (0,2,0)*scale (j axis); KI connects k->i; JK connects j->k.
    """
    # vertex cluster id per (face, axis-coord)
    vmap = {}  # (face, coord) -> cluster idx among pentagons
    pents = [cl for cl in bcs if len(cl["members"]) == 5]
    for idx, cl in enumerate(pents):
        for f, c in cl["members"]:
            vmap[(f, c)] = idx
    AXI, AXJ, AXK = (2, 0, 0), (0, 2, 0), (0, 0, 2)
    edges = {0: (AXI, AXJ), 1: (AXK, AXI), 2: (AXJ, AXK)}
    fn = [[None] * 3 for _ in range(20)]
    for f in range(20):
        for e, (va, vb) in edges.items():
            ca, cb = vmap[(f, va)], vmap[(f, vb)]
            # neighbor face: the other face sharing both vertex clusters
            shared = None
            for g in range(20):
                if g == f:
                    continue
                ga = [c for (ff, c) in pents[ca]["members"] if ff == g]
                gb = [c for (ff, c) in pents[cb]["members"] if ff == g]
                if ga and gb:
                    shared = (g, ga[0], gb[0])
                    break
            assert shared, (f, e)
            g, ga, gb = shared
            # lattice fold map at res 2 (scale 7): rot k then translate
            va7, vb7 = ijk_scale(va, 7), ijk_scale(vb, 7)
            ga7, gb7 = ijk_scale(ga, 7), ijk_scale(gb, 7)
            dfv = ijk_sub(vb7, va7)
            dgv = ijk_sub(gb7, ga7)
            rot = None
            t = dfv
            for k in range(6):
                # compare direction vectors modulo normalization:
                # use non-normalized arithmetic: rotate60ccw is linear.
                if ijk_normalize(ijk_sub(t, dgv)) == (0, 0, 0) and \
                   ijk_normalize(ijk_sub(dgv, t)) == (0, 0, 0):
                    rot = k
                    break
                t = rot60ccw_lin(t)
            assert rot is not None, (f, e)
            va7r = va7
            for _ in range(rot):
                va7r = rot60ccw_lin(va7r)
            trans = ijk_sub(ga7, va7r)
            # translate must be divisible by unitScale(2)=7
            assert all(x % 7 == 0 for x in trans), (f, e, trans)
            t0 = tuple(x // 7 for x in trans)
            # verify with edge midpoint cell (scale 7: (7,7,0)-type coords)
            fn[f][e] = (g, t0, rot)
    return fn


def rot60ccw_lin(c):
    """Linear (non-normalizing) rotate60 ccw."""
    i = ijk_scale((1, 1, 0), c[0])
    j = ijk_scale((0, 1, 1), c[1])
    k = ijk_scale((1, 0, 1), c[2])
    return ijk_add(ijk_add(i, j), k)


def classify_edge(c):
    i, j, k = c
    if k > 0:
        return 2 if j > 0 else 1  # JK else KI
    return 0  # IJ


def adjust_overage_cII(face, c, res, pent_leading4, substrate):
    """returns (overage, face, coord); overage: 0 none, 1 face edge, 2 new face"""
    max_dim = MAX_DIM_CII[res] * (3 if substrate else 1)
    s = c[0] + c[1] + c[2]
    if substrate and s == max_dim:
        return 1, face, c
    if s <= max_dim:
        return 0, face, c
    edge = classify_edge(c)
    if edge == 1 and pent_leading4:
        # rotate out of the deleted k subsequence: rotate around the
        # vertex at (maxDim, 0, 0)
        origin = (max_dim, 0, 0)
        tmp = ijk_sub(c, origin)
        tmp = rot60cw_lin(tmp)
        c = ijk_add(tmp, origin)
    g, t0, rot = FACE_NEIGHBORS[face][edge]
    for _ in range(rot):
        c = ijk_rotate60ccw(c)
    unit_scale = {0: 1, 2: 7, 4: 49, 6: 343, 8: 2401, 10: 16807,
                  12: 117649, 14: 823543, 16: 5764801}[res]
    if substrate:
        unit_scale *= 3
    c = ijk_normalize(ijk_add(c, ijk_scale(t0, unit_scale)))
    ov = 2
    if substrate and c[0] + c[1] + c[2] == max_dim:
        ov = 1
    return ov, g, c


def rot60cw_lin(c):
    i = ijk_scale((1, 0, 1), c[0])
    j = ijk_scale((1, 1, 0), c[1])
    k = ijk_scale((0, 1, 1), c[2])
    return ijk_add(ijk_add(i, j), k)


def leading_nonzero(digits):
    for d in digits:
        if d != 0:
            return d
    return 0


def decode_to_faceijk(bc_rank, digits, res, homes, pents_set):
    """h3ToFaceIjk: returns (face, coord, adj_res) in class II grid."""
    digits = list(digits)
    if bc_rank in pents_set and leading_nonzero(digits) == 5:
        digits = [ROT_CW[d] for d in digits]
    face, c = homes[bc_rank]
    for r in range(1, res + 1):
        if r % 2 == 1:
            c = down_ap7(c)
        else:
            c = down_ap7r(c)
        c = neighbor(c, digits[r - 1])
    adj_res = res
    if res % 2 == 1:
        c = down_ap7r(c)
        adj_res += 1
    pl4 = 1 if (bc_rank in pents_set and leading_nonzero(digits) == 4) else 0
    while True:
        ov, face, c = adjust_overage_cII(face, c, adj_res, pl4, False)
        if ov != 2:
            break
        pl4 = 0  # only first adjustment uses it? (pentagon secondary)
    return face, c, adj_res


def cell_center(bc_rank, digits, res, homes, pents_set):
    face, c, adj_res = decode_to_faceijk(bc_rank, digits, res, homes, pents_set)
    return hex2d_to_geo(ijk_to_hex2d(c), face, adj_res, False)


VERTS_CII = [(2, 1, 0), (1, 2, 0), (0, 2, 1), (0, 1, 2), (1, 0, 2), (2, 0, 1)]
VERTS_CIII = [(5, 4, 0), (1, 5, 0), (0, 5, 4), (0, 1, 5), (4, 0, 5), (5, 0, 1)]


def cell_boundary(bc_rank, digits, res, homes, pents_set):
    face, c, adj_res = decode_to_faceijk(bc_rank, digits, res, homes, pents_set)
    # wait: boundary needs the cell center at the ORIGINAL grid, then
    # substrate transform. decode_to_faceijk already bumped class III to
    # class II via downAp7r. libh3 does the substrate transform from the
    # original res coords. Redo: get raw coords without the class III bump.
    raise NotImplementedError


UNIT_SCALE_CII = {0: 1, 2: 7, 4: 49, 6: 343, 8: 2401, 10: 16807,
                  12: 117649, 14: 823543, 16: 5764801}


def up_ap7r_exact(c):
    return up_ap7r(c)


def h3_to_faceijk(bc_rank, digits, res, homes, pents_set):
    """libh3 _h3ToFaceIjk: returns (face, coord) at ORIGINAL res."""
    digits = list(digits)
    if bc_rank in pents_set and leading_nonzero(digits) == 5:
        digits = [ROT_CW[d] for d in digits]
    face, c = homes[bc_rank]
    for r in range(1, res + 1):
        if r % 2 == 1:
            c = down_ap7(c)
        else:
            c = down_ap7r(c)
        c = neighbor(c, digits[r - 1])
    orig = c
    ares = res
    if res % 2 == 1:
        c = down_ap7r(c)
        ares += 1
    pl4 = 1 if (bc_rank in pents_set and leading_nonzero(digits) == 4) else 0
    ov, f2, c2 = adjust_overage_cII(face, c, ares, pl4, False)
    if ov == 2:
        if bc_rank in pents_set:
            while True:
                ov2, f2, c2 = adjust_overage_cII(f2, c2, ares, 0, False)
                if ov2 != 2:
                    break
        if ares != res:
            c2 = up_ap7r(c2)
        return f2, c2
    return face, orig


def cell_center2(bc_rank, digits, res, homes, pents_set):
    face, c = h3_to_faceijk(bc_rank, digits, res, homes, pents_set)
    return hex2d_to_geo(ijk_to_hex2d(c), face, res, False)


def cell_boundary2(bc_rank, digits, res, homes, pents_set, fn):
    """_faceIjkToGeoBoundary (hexagon only for now)."""
    face, c = h3_to_faceijk(bc_rank, digits, res, homes, pents_set)
    adj_res = res
    cc = down_ap3r(down_ap3(c))
    if res % 2 == 1:
        cc = down_ap7r(cc)
        adj_res += 1
    verts = VERTS_CIII if res % 2 == 1 else VERTS_CII
    fijk_verts = [(face, ijk_normalize(ijk_add(cc, v))) for v in verts]
    out = []
    last_face, last_ov = -1, 0
    center_face = face
    for vert in range(0, 7):
        v = vert % 6
        fv, cv = fijk_verts[v]
        ov, fv, cv = adjust_overage_cII(fv, cv, adj_res, 0, True)
        if res % 2 == 1 and vert > 0 and fv != last_face and last_ov != 1:
            # icosa edge crossing: extra vertex
            last_v = (v + 5) % 6
            orig0 = ijk_to_hex2d(fijk_verts[last_v][1])
            orig1 = ijk_to_hex2d(fijk_verts[v][1])
            max_dim = MAX_DIM_CII[adj_res] * 3
            face2 = fv if last_face == center_face else last_face
            # which edge of center_face leads to face2?
            edge = next(e for e in range(3) if fn[center_face][e][0] == face2)
            # substrate coords of the icosa edge endpoints
            if edge == 0:   # IJ
                e0, e1 = (max_dim, 0, 0), (0, max_dim, 0)
            elif edge == 1:  # KI
                e0, e1 = (0, 0, max_dim), (max_dim, 0, 0)
            else:            # JK
                e0, e1 = (0, max_dim, 0), (0, 0, max_dim)
            p0, p1 = ijk_to_hex2d(e0), ijk_to_hex2d(e1)
            inter = v2d_intersect(orig0, orig1, p0, p1)
            if (not v2d_eq(inter, orig0)) and (not v2d_eq(inter, orig1)):
                out.append(hex2d_to_geo(inter, center_face, adj_res, True))
        if vert < 6:
            out.append(hex2d_to_geo(ijk_to_hex2d(cv), fv, adj_res, True))
        last_face, last_ov = fv, ov
    return out


def v2d_intersect(p0, p1, p2, p3):
    s1 = (p1[0] - p0[0], p1[1] - p0[1])
    s2 = (p3[0] - p2[0], p3[1] - p2[1])
    t = (s2[0] * (p0[1] - p2[1]) - s2[1] * (p0[0] - p2[0])) / \
        (-s2[0] * s1[1] + s1[0] * s2[1])
    return (p0[0] + t * s1[0], p0[1] + t * s1[1])


def v2d_eq(a, b):
    return abs(a[0] - b[0]) < 1e-6 and abs(a[1] - b[1]) < 1e-6


def run_decode_checks():
    global FACE_NEIGHBORS
    bcs = base_cells()
    homes = assign_homes(bcs)
    pents_set = set(PENT_BC)
    FACE_NEIGHBORS = derive_face_neighbors(bcs)
    exp = 0x8f2195c2c540080
    digits = [(exp >> (3 * (15 - r))) & 0x7 for r in range(1, 16)]
    lat, lon = cell_center2(16, digits, 15, homes, pents_set)
    print("center: lon=%.16f lat=%.16f" % (math.degrees(lon), math.degrees(lat)))
    b = cell_boundary2(16, digits, 15, homes, pents_set, FACE_NEIGHBORS)
    kwkt = [59.9999887940966801, 40.0000005857359184,
            59.9999930723770873, 39.9999959172691604,
            60.0000004137070206, 39.9999963654760862,
            60.0000034767576835, 40.0000014821500258,
            59.9999991984775178, 40.0000061506173239,
            59.9999918571464477, 40.0000057024101636,
            59.9999887940966801, 40.0000005857359184]
    print("boundary verts:", len(b))
    for idx, (bl, bo) in enumerate(b):
        print("v%d: lon=%.16f lat=%.16f exp lon=%.16f lat=%.16f" %
              (idx, math.degrees(bo), math.degrees(bl),
               kwkt[2 * idx] if 2 * idx < len(kwkt) else float('nan'),
               kwkt[2 * idx + 1] if 2 * idx < len(kwkt) else float('nan')))
    errs = []
    for idx, (bl, bo) in enumerate(b[:6]):
        errs.append(abs(math.degrees(bo) - kwkt[2 * idx]))
        errs.append(abs(math.degrees(bl) - kwkt[2 * idx + 1]))
    print("max boundary err (deg):", max(errs) if errs else None)


def assign_homes2(bcs, mixed_rule="ij"):
    """mixed_rule: 'ij' = prefer the (1,1,0) view; 'minface' = min face."""
    homes = []
    for rank, cl in enumerate(bcs):
        m = sorted(cl["members"])
        if len(m) == 1:
            homes.append(m[0])
        elif len(m) == 2:
            ij = [x for x in m if x[1] == (1, 1, 0)]
            if len(ij) == 1 and mixed_rule == "ij":
                homes.append(ij[0])
            else:
                homes.append(m[0])  # min face
        else:
            # pentagon: libh3 anchors every pentagon at the I-axis vertex
            # (2,0,0) of its home face (the KI-edge pentLeading4 overage
            # math assumes it); min face among the (2,0,0) views.
            iviews = [x for x in m if x[1] == (2, 0, 0)]
            assert iviews, f"pentagon without (2,0,0) view: {m}"
            homes.append(iviews[0])
    return homes


def rotate_pent_ccw(digits):
    digits = [ROT_CCW[d] for d in digits]
    # libh3: after rotating, if leading nonzero is K, rotate whole again
    for d in digits:
        if d != 0:
            if d == 1:
                digits = [ROT_CCW[x] for x in digits]
            break
    return digits


def face_rot_to_home(face, coord, bc_rank, bcs, homes, fn):
    """ccw rotations from face's frame to the home frame for cell bc."""
    hf, hc = homes[bc_rank]
    if hf == face:
        return 0
    members = bcs[bc_rank]["members"]
    if len(members) == 2:
        # fold across the shared edge face->hf
        for e in range(3):
            if fn[face][e][0] == hf:
                return fn[face][e][2]
        raise AssertionError(f"faces {face},{hf} not adjacent for bc{bc_rank}")
    # pentagon: compose folds along shortest path around the vertex
    pfaces = [f for f, _ in members]
    # adjacency among the 5: via fn
    # BFS from face to hf
    from collections import deque
    q = deque([(face, 0)])
    seen = {face}
    while q:
        f0, rot = q.popleft()
        if f0 == hf:
            return rot % 6
        for e in range(3):
            g, _, r = fn[f0][e]
            if g in pfaces and g not in seen:
                seen.add(g)
                q.append((g, (rot + r) % 6))
    raise AssertionError


def encode_full(lat, lon, res, bcs, homes, fn, pents_set, cw_offsets=None):
    face, v = geo_to_hex2d(lat, lon, res)
    c = hex2d_to_ijk(v)
    digits = [0] * res
    for r in range(res, 0, -1):
        last = c
        if r % 2 == 1:
            c = up_ap7(c)
            center = down_ap7(c)
        else:
            c = up_ap7r(c)
            center = down_ap7r(c)
        digits[r - 1] = unit_ijk_to_digit(ijk_sub(last, center))
    # res-0 coord c on face; fold if out of triangle
    rot = 0
    f0 = face
    while c[0] + c[1] + c[2] > 2:
        _, f0, c2 = adjust_overage_cII(f0, c, 0, 0, False)
        edge = classify_edge(c)
        rot += FACE_NEIGHBORS[f0 if False else 0][0][2] * 0  # placeholder
        c = c2
        break  # recompute rot below properly
    # Proper fold handling: redo with explicit rot accumulation
    return None


def encode_full2(lat, lon, res, bcs, homes, fn, pents_set, cw_offsets=None,
                 bc_lookup=None):
    face, v = geo_to_hex2d(lat, lon, res)
    c = hex2d_to_ijk(v)
    digits = [0] * res
    for r in range(res, 0, -1):
        last = c
        if r % 2 == 1:
            c = up_ap7(c)
            center = down_ap7(c)
        else:
            c = up_ap7r(c)
            center = down_ap7r(c)
        digits[r - 1] = unit_ijk_to_digit(ijk_sub(last, center))
    rot = 0
    f0 = face
    guard = 0
    while c[0] + c[1] + c[2] > 2:
        edge = classify_edge(c)
        g, t0, erot = fn[f0][edge]
        cc = c
        for _ in range(erot):
            cc = ijk_rotate60ccw(cc)
        c = ijk_normalize(ijk_add(cc, t0))
        f0 = g
        rot += erot
        guard += 1
        assert guard < 4
    bc = bc_lookup[(f0, c)]
    rot = (rot + face_rot_to_home(f0, c, bc, bcs, homes, fn)) % 6
    if bc in pents_set:
        lead = leading_nonzero(digits)
        if lead == 1:
            if cw_offsets and f0 in cw_offsets.get(bc, ()):
                digits = [ROT_CW[d] for d in digits]
            else:
                digits = [ROT_CCW[d] for d in digits]
        for _ in range(rot):
            digits = rotate_pent_ccw(digits)
    else:
        for _ in range(rot):
            digits = [ROT_CCW[d] for d in digits]
    return bc, digits


def make_bc_lookup(bcs):
    d = {}
    for rank, cl in enumerate(bcs):
        for f, c in cl["members"]:
            d[(f, c)] = rank
    return d


def to_index(bc, digits):
    v = (1 << 59) | (len(digits) << 52) | (bc << 45)
    ds = list(digits) + [7] * (15 - len(digits))
    for r, d in enumerate(ds):
        v |= d << (3 * (14 - r))
    return v


def sf_test(mixed_rule):
    bcs = base_cells()
    homes = assign_homes2(bcs, mixed_rule)
    pents_set = set(PENT_BC)
    fn = derive_face_neighbors(bcs)
    lut = make_bc_lookup(bcs)
    lat, lon = math.radians(37.775938728915946), math.radians(-122.41795063018799)
    bc, digits = encode_full2(lat, lon, 9, bcs, homes, fn, pents_set,
                              bc_lookup=lut)
    got = to_index(bc, digits)
    exp = 0x8928308280fffff
    print(f"rule={mixed_rule}: bc={bc} digits={digits} "
          f"got={got:x} exp={exp:x} match={got == exp}")
    print("bc20 members:", bcs[20]["members"], "home:", homes[20])
    # Also re-check the (60,40,15) vector through the full encoder
    la, lo = math.radians(40.0), math.radians(60.0)
    bc2, d2 = encode_full2(la, lo, 15, bcs, homes, fn, pents_set, bc_lookup=lut)
    print("60/40 through full encoder:", hex(to_index(bc2, d2)),
          "match:", to_index(bc2, d2) == 0x8f2195c2c540080)


def all_cells(res, pents_set):
    """Enumerate (bc, digits) for all valid cells at res."""
    out = []
    def rec(bc, digits):
        if len(digits) == res:
            out.append((bc, tuple(digits)))
            return
        for d in range(7):
            if bc in pents_set and d == 1 and leading_nonzero(digits) == 0:
                continue  # pentagon deleted K subsequence
            rec(bc, digits + [d])
    for bc in range(122):
        rec(bc, [])
    return out


def fit_cw_offsets(bcs, homes, fn, pents_set, lut):
    """Per pentagon, find the cwOffset face set making res-1..2 children
    round-trip (decode center -> encode -> same id)."""
    import itertools
    cw = {}
    for bc in sorted(pents_set):
        faces = sorted(f for f, _ in bcs[bc]["members"])
        nonhome = [f for f in faces if f != homes[bc][0]]
        cands = [()] + list(itertools.combinations(nonhome, 2)) + \
            list(itertools.combinations(nonhome, 1))
        best = None
        for cand in cands:
            ok = True
            for res in (1, 2):
                for _, digits in [(bc, d) for (b, d) in all_cells_for(bc, res, pents_set)]:
                    la, lo = cell_center2(bc, list(digits), res, homes, pents_set)
                    eb, ed = encode_full2(la, lo, res, bcs, homes, fn,
                                          pents_set, cw_offsets={bc: cand},
                                          bc_lookup=lut)
                    if (eb, tuple(ed)) != (bc, digits):
                        ok = False
                        break
                if not ok:
                    break
            if ok:
                best = cand
                break
        cw[bc] = best
        print(f"pent bc{bc}: faces={faces} home={homes[bc]} cwOffset={best}")
    return cw


def all_cells_for(bc, res, pents_set):
    out = []
    def rec(digits):
        if len(digits) == res:
            out.append((bc, tuple(digits)))
            return
        for d in range(7):
            if bc in pents_set and d == 1 and leading_nonzero(digits) == 0:
                continue
            rec(digits + [d])
    rec([])
    return out


def full_roundtrip(bcs, homes, fn, pents_set, lut, cw, res):
    bad = 0
    cells = all_cells(res, pents_set)
    for bc, digits in cells:
        la, lo = cell_center2(bc, list(digits), res, homes, pents_set)
        eb, ed = encode_full2(la, lo, res, bcs, homes, fn, pents_set,
                              cw_offsets=cw, bc_lookup=lut)
        if (eb, tuple(ed)) != (bc, digits):
            bad += 1
            if bad <= 5:
                print(f"  MISMATCH res{res}: {(bc, digits)} -> {(eb, tuple(ed))}")
    print(f"roundtrip res {res}: {len(cells)} cells, {bad} mismatches")
    return bad


def raw_encode(lat, lon, res):
    """face projection + digit extraction + res-0 fold; returns
    (owner_face, in_triangle_coord, raw_digits, fold_rot)."""
    face, v = geo_to_hex2d(lat, lon, res)
    c = hex2d_to_ijk(v)
    digits = [0] * res
    for r in range(res, 0, -1):
        last = c
        if r % 2 == 1:
            c = up_ap7(c)
            center = down_ap7(c)
        else:
            c = up_ap7r(c)
            center = down_ap7r(c)
        digits[r - 1] = unit_ijk_to_digit(ijk_sub(last, center))
    rot = 0
    f0 = face
    guard = 0
    while c[0] + c[1] + c[2] > 2:
        edge = classify_edge(c)
        g, t0, erot = FACE_NEIGHBORS[f0][edge]
        cc = c
        for _ in range(erot):
            cc = ijk_rotate60ccw(cc)
        c = ijk_normalize(ijk_add(cc, t0))
        f0 = g
        rot += erot
        guard += 1
        assert guard < 4
    return f0, c, digits, rot % 6


def try_rot_hex(raw, final):
    for r in range(6):
        t = list(raw)
        for _ in range(r):
            t = [ROT_CCW[d] for d in t]
        if t == list(final):
            return r
    return None


def try_rot_pent(raw, final):
    for r in range(6):
        t = list(raw)
        for _ in range(r):
            t = rotate_pent_ccw(t)
        if t == list(final):
            return r
    return None


def derive_rotations(bcs, homes, fn, pents, lut):
    """Empirically fit table_rot[(bc, face)] and cw-offset faces by
    requiring encode to reproduce decode over res 1-3 children."""
    table_rot = {}
    cwoff = {bc: set() for bc in pents}
    pending_k = []
    for rank, cl in enumerate(bcs):
        faces = sorted(set(f for f, _ in cl["members"]))
        need = set(faces)
        for res in (1, 2, 3):
            if not need and not (rank in pents):
                break
            for _, digits in all_cells_for(rank, res, pents):
                la, lo = cell_center2(rank, list(digits), res, homes, pents)
                f0, c, raw, frot = raw_encode(la, lo, res)
                assert lut[(f0, c)] == rank, \
                    f"bc{rank} child {digits} folded to wrong cell {lut[(f0, c)]}"
                lead = leading_nonzero(raw)
                if lead == 0:
                    continue  # all-zero word carries no rotation info
                if rank in pents and lead == 1:
                    pending_k.append((rank, f0, raw, list(digits), frot))
                    continue
                if rank in pents:
                    r = try_rot_pent(raw, digits)
                else:
                    r = try_rot_hex(raw, digits)
                assert r is not None, (rank, digits, raw)
                tr = (r - frot) % 6
                key = (rank, f0)
                if key in table_rot:
                    assert table_rot[key] == tr, \
                        f"inconsistent rot for {key}: {table_rot[key]} vs {tr}"
                else:
                    table_rot[key] = tr
                    need.discard(f0)
            if not need and rank not in pents:
                break
    # fit K-leading fixup for pentagons
    for rank, f0, raw, final, frot in pending_k:
        R = (table_rot[(rank, f0)] + frot) % 6
        ok_ccw = ok_cw = False
        for fix, flag in ((ROT_CCW, "ccw"), (ROT_CW, "cw")):
            t = [fix[d] for d in raw]
            for _ in range(R):
                t = rotate_pent_ccw(t)
            if t == final:
                if flag == "ccw":
                    ok_ccw = True
                else:
                    ok_cw = True
        assert ok_ccw or ok_cw, (rank, f0, raw, final)
        if ok_cw and not ok_ccw:
            cwoff[rank].add(f0)
        elif ok_cw and ok_ccw:
            pass  # ambiguous sample; ignore
    return table_rot, cwoff


def encode_v3(lat, lon, res, homes, pents, lut, table_rot, cwoff):
    f0, c, digits, frot = raw_encode(lat, lon, res)
    bc = lut[(f0, c)]
    rot = (frot + table_rot[(bc, f0)]) % 6
    if bc in pents:
        if leading_nonzero(digits) == 1:
            if f0 in cwoff[bc]:
                digits = [ROT_CW[d] for d in digits]
            else:
                digits = [ROT_CCW[d] for d in digits]
        for _ in range(rot):
            digits = rotate_pent_ccw(digits)
    else:
        for _ in range(rot):
            digits = [ROT_CCW[d] for d in digits]
    return bc, digits
