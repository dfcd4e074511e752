"""GRIB2 codec — pure struct + numpy, no eccodes/cfgrib: the WMO
gridded-binary format that carries the other half of real
meteorological archives next to NetCDF (reanalyses, NWP output,
satellite products). Written against the public WMO FM 92 GRIB
edition 2 specification (the section/template/octet layout is
normative and openly published).

Decodes: multi-message files (each ``GRIB…7777`` envelope), section 1
identification (reference time), section 3 grid definition templates
3.0 (regular latitude/longitude grids, microdegree coordinates in
GRIB's sign-and-magnitude integer encoding, Ni/Nj, scan modes 0 and
+y) and 3.40 (regular AND reduced Gaussian grids — latitudes are the
Legendre quadrature nodes, N in octets 68-71; reduced grids carry one
point count per parallel in section 3's optional list, ERA5's native
layout), section 4 product definition
templates 4.0 (parameter category/number, forecast time) and 4.8
(statistics over a time interval: interval end, statistical process —
the accumulation/max products archives publish), section 5 data
representation
templates 5.0 (simple packing: IEEE reference value R, binary scale
E, decimal scale D, any bits-per-value width — values are
``(R + X·2^E)/10^D``), 5.2 (complex packing: NG groups, each with its
own reference and bit width, group widths/lengths themselves
bit-packed streams), 5.3 (complex packing with first- or second-order
spatial differencing — the template operational ECMWF/NOAA NWP output
overwhelmingly uses, with octet-23 missing-value management 1/2),
5.40 (JPEG 2000 packing, decoded through the from-scratch Part-1
codec in ``sources/j2k.py``), 5.41 (PNG packing, decoded through
this repo's own ``operators/png.py``), 5.42 (CCSDS/AEC through
``sources/szip.py``) and 5.50/5.51 (spherical-harmonic simple +
complex packing with Laplacian scaling and the IEEE sub-truncation,
decoded to the coefficient domain via ``grib2_spectral_long``), grid
templates 3.0 / 3.30 (Lambert conformal) / 3.40 (regular + reduced
Gaussian) / 3.50 (spherical harmonics) / 3.90 (geostationary space
view with off-disk masking), section 6 bitmaps
(indicator 0 = explicit bitmap, 254 = previously defined,
255 = none), and section 7 bit-packed data. Other grid/product/
representation templates (Gaussian latitude-band subsets, azimuthal/
Mercator regionals) raise a crisp
``NotImplementedError`` naming the template — the codec-family
loud-seam convention: never silent wrong values.

The writer exists for fixtures and synthesis (``build_grib2``): real
MSB-first bit packing at any width, real bitmaps, real PNG-packed
payloads, correct sign-magnitude fields — so the reader is exercised
against genuinely packed messages and a SQL oracle can re-derive
decoded statistics exactly.

Reference parity: the reference ingests gridded climate data through
libraries (`ingest/netcdf_reader.py` accepts whatever the ecosystem
wrote); GRIB2 extends the same read-anything posture to the WMO
format family.
"""

from __future__ import annotations

import struct

import numpy as np


def _sm_int(raw: int, nbits: int) -> int:
    """GRIB sign-and-magnitude: the top bit flags negative."""
    sign_bit = 1 << (nbits - 1)
    return -(raw & ~sign_bit) if raw & sign_bit else raw


def _sm_enc(val: int, nbits: int) -> int:
    sign_bit = 1 << (nbits - 1)
    if val < 0:
        mag = -val
        if mag & sign_bit:
            raise ValueError(f"magnitude {mag} overflows {nbits}-bit "
                             "sign-magnitude field")
        return sign_bit | mag
    return val


def _unpack_bits(data: bytes, nbits: int, count: int) -> np.ndarray:
    """MSB-first fixed-width unpack (section 7 simple packing)."""
    if nbits == 0:
        return np.zeros(count, np.int64)
    total = nbits * count
    if total > 8 * len(data):
        raise ValueError("GRIB2 data section shorter than the packed "
                         "value stream")
    bits = np.unpackbits(np.frombuffer(data, np.uint8),
                         count=total).reshape(count, nbits)
    weights = (1 << np.arange(nbits - 1, -1, -1)).astype(np.int64)
    return bits.astype(np.int64) @ weights


def _pack_bits(values: np.ndarray, nbits: int) -> bytes:
    vals = np.asarray(values, np.int64)
    if nbits == 0:
        return b""
    if vals.size and int(vals.max()) >= (1 << nbits):
        raise ValueError(f"value {int(vals.max())} overflows "
                         f"{nbits}-bit packing")
    bits = ((vals[:, None] >> np.arange(nbits - 1, -1, -1)) & 1) \
        .astype(np.uint8).reshape(-1)
    return np.packbits(bits).tobytes()


def _sm_bytes_enc(val: int, nbytes: int) -> bytes:
    """Sign-and-magnitude big-endian integer in ``nbytes`` bytes (the
    template-7.3 extra-descriptor encoding: top bit of the first byte
    flags negative)."""
    sign = val < 0
    mag = -val if sign else val
    if mag >> (8 * nbytes - 1):
        raise ValueError(f"magnitude {mag} overflows {nbytes}-byte "
                         "sign-magnitude field")
    raw = mag | (1 << (8 * nbytes - 1)) if sign else mag
    return raw.to_bytes(nbytes, "big")


def _sm_bytes_dec(buf: bytes) -> int:
    raw = int.from_bytes(buf, "big")
    sign_bit = 1 << (8 * len(buf) - 1)
    return -(raw & ~sign_bit) if raw & sign_bit else raw


def _unpack_complex(s5: bytes, s7_body: bytes, n_data: int,
                    nbits: int, dtemplate: int
                    ) -> tuple[np.ndarray, np.ndarray | None]:
    """Decode data representation template 5.2 (complex packing) or
    5.3 (complex packing + spatial differencing), data templates
    7.2/7.3: NG groups, each a (reference, width, length) triple whose
    three descriptor streams are themselves bit-packed (each padded to
    a byte boundary), followed by one continuous value bitstream.
    Returns ``(X, missing)`` — the integer field (spatial differences
    already reconstructed for 5.3; the caller applies
    ``(R + X·2^E)/10^D``) and a bool mask of embedded-missing points
    (None when octet 23's missing-value management is 0).

    Layout per the public WMO FM 92 templates; reconstruction order
    matches the normative notes (first ``order`` values are carried
    verbatim in the extra descriptors; every later packed value gets
    the overall minimum added back before the running sum).

    Missing-value management (octet 23 = 1 primary / 2 primary +
    secondary — accumulation products use it to embed the
    no-observation sentinel INSIDE group values instead of a bitmap):
    in a width-w > 0 group the all-ones offset 2^w − 1 marks a primary
    missing point and 2^w − 2 a secondary one; a width-0 group is
    entirely missing when its REFERENCE carries the same all-ones
    markers in the reference width. For 5.3 the spatial-differencing
    recurrence runs over the NON-missing subsequence only (the
    normative ordering: missing points never enter the running
    sums)."""
    split = s5[21]
    miss_mgmt = s5[22]
    if split != 1:
        raise NotImplementedError(
            f"GRIB2 group-splitting method {split} (general group "
            "splitting = 1 only)")
    if miss_mgmt not in (0, 1, 2):
        raise NotImplementedError(
            f"GRIB2 missing-value management {miss_mgmt} (0 none / "
            "1 primary / 2 primary+secondary only)")
    (ng,) = struct.unpack_from(">I", s5, 31)
    ref_gw = s5[35]
    bits_gw = s5[36]
    (ref_gl,) = struct.unpack_from(">I", s5, 37)
    len_inc = s5[41]
    (last_len,) = struct.unpack_from(">I", s5, 42)
    bits_gl = s5[46]

    pos = 0
    order = 0
    ival1 = ival2 = gmin = 0
    if dtemplate == 3:
        order = s5[47]
        nb_extra = s5[48]
        if order not in (1, 2):
            raise NotImplementedError(
                f"GRIB2 spatial differencing order {order} (1/2 only)")
        if nb_extra == 0:
            raise ValueError("GRIB2 template 5.3 with zero extra-"
                             "descriptor octets")
        ival1 = _sm_bytes_dec(s7_body[pos:pos + nb_extra])
        pos += nb_extra
        if order == 2:
            ival2 = _sm_bytes_dec(s7_body[pos:pos + nb_extra])
            pos += nb_extra
        gmin = _sm_bytes_dec(s7_body[pos:pos + nb_extra])
        pos += nb_extra

    def take(width: int, count: int) -> np.ndarray:
        nonlocal pos
        nbytes = (width * count + 7) // 8
        out = _unpack_bits(s7_body[pos:pos + nbytes], width, count)
        pos += nbytes
        return out

    refs = take(nbits, ng)
    widths = ref_gw + take(bits_gw, ng)
    lengths = ref_gl + take(bits_gl, ng) * len_inc
    if ng:
        lengths[-1] = last_len
    if int(lengths.sum()) != n_data:
        raise ValueError("GRIB2 complex-packed group lengths disagree "
                         "with the point count")

    bit_budget = int((widths * lengths).sum())
    if bit_budget > 8 * (len(s7_body) - pos):
        raise ValueError("GRIB2 complex-packed value stream shorter "
                         "than the group descriptors demand")
    bits = np.unpackbits(np.frombuffer(s7_body[pos:], np.uint8),
                         count=bit_budget)
    x = np.empty(n_data, np.int64)
    miss = np.zeros(n_data, bool) if miss_mgmt else None
    ref_m1 = (1 << nbits) - 1           # width-0 reference markers
    ref_m2 = ref_m1 - 1
    bo = vo = 0
    for g in range(int(ng)):
        w, ln, rf = int(widths[g]), int(lengths[g]), int(refs[g])
        if w == 0:
            if miss_mgmt and (rf == ref_m1
                              or (miss_mgmt == 2 and rf == ref_m2)):
                x[vo:vo + ln] = 0
                miss[vo:vo + ln] = True
            else:
                x[vo:vo + ln] = rf
        else:
            weights = (1 << np.arange(w - 1, -1, -1)).astype(np.int64)
            raw = (bits[bo:bo + w * ln].reshape(ln, w).astype(np.int64)
                   @ weights)
            if miss_mgmt:
                m1 = (1 << w) - 1
                mk = raw == m1
                if miss_mgmt == 2:
                    mk |= raw == m1 - 1
                miss[vo:vo + ln] = mk
                raw = np.where(mk, -rf, raw)    # x = 0 at missing slots
            x[vo:vo + ln] = rf + raw
        bo += w * ln
        vo += ln

    if dtemplate == 3:
        if miss is not None and miss.any():
            # recurrence over the non-missing subsequence only
            nm = ~miss
            z = x[nm]
            if z.size <= order:
                raise ValueError("GRIB2 5.3 field with fewer non-"
                                 "missing points than the "
                                 "differencing order")
            z[order:] += gmin
            z[0] = ival1
            if order == 2:
                z[1] = ival2
                z[2:] = np.cumsum(np.cumsum(z[2:])
                                  + (ival2 - ival1)) + ival2
            else:
                z[1:] = np.cumsum(z[1:]) + ival1
            x[nm] = z
        else:
            x[order:] += gmin
            x[0] = ival1
            if order == 2:
                x[1] = ival2
                x[2:] = np.cumsum(np.cumsum(x[2:])
                                  + (ival2 - ival1)) + ival2
            else:
                x[1:] = np.cumsum(x[1:]) + ival1
    return x, miss


def _pack_complex(flat: np.ndarray, group_size: int,
                  spatial_diff_order: int = 0,
                  miss_primary: np.ndarray | None = None,
                  miss_secondary: np.ndarray | None = None
                  ) -> tuple[bytes, bytes, int]:
    """Complex-pack ``flat`` (non-negative int64) into the template
    5.2/5.3 section-5 tail and section-7 body. Returns
    ``(s5_tail, s7_body, nbits_refs)`` where ``s5_tail`` is the
    template bytes from octet 22 onward (group split method …) and
    ``nbits_refs`` goes into octet 20. Groups are consecutive runs of
    ``group_size`` points (general group splitting, method 1).

    ``miss_primary`` / ``miss_secondary`` (bool masks over ``flat``;
    values at masked slots are ignored) arm missing-value management
    1/2: masked points are stored as the in-group all-ones markers
    (2^w − 1 primary, 2^w − 2 secondary) and group widths/references
    widen just enough that no legitimate offset or width-0 reference
    collides with a marker — the decoder-side contract in
    ``_unpack_complex``. With spatial differencing the recurrence
    covers the non-missing subsequence only."""
    vals = np.asarray(flat, np.int64).copy()
    n = int(vals.size)
    if n == 0:
        raise ValueError("complex packing wants at least one value")
    mp = (np.zeros(n, bool) if miss_primary is None
          else np.asarray(miss_primary, bool).reshape(-1))
    ms = (np.zeros(n, bool) if miss_secondary is None
          else np.asarray(miss_secondary, bool).reshape(-1))
    if mp.size != n or ms.size != n:
        raise ValueError("missing masks must match the value count")
    if (mp & ms).any():
        raise ValueError("a point cannot be both primary- and "
                         "secondary-missing")
    mgmt = 2 if miss_secondary is not None else (
        1 if miss_primary is not None else 0)
    missing = mp | ms
    nm = ~missing

    extra = b""
    order = int(spatial_diff_order)
    if order:
        if order not in (1, 2):
            raise ValueError("spatial differencing order must be 1/2")
        z = vals[nm] if mgmt else vals
        if int(z.size) <= order:
            raise ValueError("field shorter than the differencing "
                             "order")
        ivals = [int(z[k]) for k in range(order)]
        d = z.copy()
        d[order:] = np.diff(z, n=order)
        gmin = int(d[order:].min())
        d[order:] -= gmin
        d[:order] = 0
        mags = [abs(v) for v in ivals + [gmin]] + [1]
        nb_extra = (max(mags).bit_length() + 1 + 7) // 8
        extra = b"".join(_sm_bytes_enc(v, nb_extra)
                         for v in ivals + [gmin])
        if mgmt:
            vals[nm] = d
        else:
            vals = d

    reserve = mgmt                       # marker codes kept clear
    ng = (n + group_size - 1) // group_size
    bounds = [(g * group_size, min((g + 1) * group_size, n))
              for g in range(ng)]
    refs = np.zeros(ng, np.int64)
    widths = np.zeros(ng, np.int64)
    all_missing = np.zeros(ng, bool)     # refs patched after nbits known
    all_secondary = np.zeros(ng, bool)
    for g, (a, b) in enumerate(bounds):
        pres = nm[a:b]
        if mgmt and not pres.any():
            all_missing[g] = True
            all_secondary[g] = bool(ms[a:b].all())
            if not all_secondary[g] and not mp[a:b].all():
                # mixed primary/secondary: per-value markers need w>=2
                widths[g] = 2
                all_missing[g] = False
                refs[g] = 0
            continue
        gv = vals[a:b][pres] if mgmt else vals[a:b]
        refs[g] = int(gv.min())
        maxoff = int(gv.max() - refs[g])
        w = maxoff.bit_length()
        if mgmt and (missing[a:b].any() or w > 0):
            # group carries per-value codes: keep the top `reserve`
            # codes free of legitimate offsets
            while w < 64 and maxoff > (1 << w) - 1 - reserve:
                w += 1
            if missing[a:b].any():
                w = max(w, 1 if mgmt == 1 else 2)
        widths[g] = w
    lengths = np.array([b - a for a, b in bounds], np.int64)

    legit = refs[~all_missing]
    max_ref = int(legit.max()) if legit.size else 0
    nbits_refs = max_ref.bit_length()
    if mgmt:
        # width-0 reference markers must stay distinct from any
        # legitimate reference
        while nbits_refs < 64 and max_ref > (1 << nbits_refs) - 1 - reserve:
            nbits_refs += 1
        nbits_refs = max(nbits_refs, 1 if mgmt == 1 else 2)
        refs[all_missing & ~all_secondary] = (1 << nbits_refs) - 1
        refs[all_missing & all_secondary] = (1 << nbits_refs) - 2

    ref_gw = int(widths.min())
    bits_gw = int((widths - ref_gw).max()).bit_length()
    ref_gl = int(lengths.min())
    bits_gl = int((lengths - ref_gl).max()).bit_length()

    subs = (struct.pack(">f", 9999.0) if mgmt >= 1
            else struct.pack(">I", 0))
    subs += (struct.pack(">f", 8888.0) if mgmt == 2
             else struct.pack(">I", 0))
    s5_tail = (bytes([1, mgmt])                   # split=1, mgmt
               + subs                             # missing substitutes
               + struct.pack(">I", ng)
               + bytes([ref_gw, bits_gw])
               + struct.pack(">I", ref_gl)
               + bytes([1])                       # length increment
               + struct.pack(">I", int(lengths[-1]))
               + bytes([bits_gl]))
    if order:
        s5_tail += bytes([order, len(extra) // (order + 1)])

    body = (extra
            + _pack_bits(refs, nbits_refs)
            + _pack_bits(widths - ref_gw, bits_gw)
            + _pack_bits((lengths - ref_gl), bits_gl))
    # one CONTINUOUS value bitstream across groups (byte padding only
    # at the very end) — vectorized per group, no per-value loop
    chunks = []
    for g, (a, b) in enumerate(bounds):
        w = int(widths[g])
        if w == 0:
            continue
        v = vals[a:b] - refs[g]
        if mgmt:
            m1 = (1 << w) - 1
            v = np.where(mp[a:b], m1, v)
            v = np.where(ms[a:b], m1 - 1, v)
        chunks.append(((v[:, None] >> np.arange(w - 1, -1, -1)) & 1)
                      .astype(np.uint8).reshape(-1))
    stream = (np.packbits(np.concatenate(chunks)).tobytes()
              if chunks else b"")
    return s5_tail, body + stream, nbits_refs


def lambert_latlon(ni: int, nj: int, la1: float, lo1: float,
                   lad: float, lov: float, dx: float, dy: float,
                   latin1: float, latin2: float,
                   radius: float = 6371229.0
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Per-cell (lat, lon) in degrees for a Lambert-conformal grid
    (template 3.30, spherical earth, northern projection centre,
    scan +x+y): forward-project the (la1, lo1) anchor, lay the
    x/y metre grid, inverse-project every node. The conic constant
    n, cone factor F and radius function are the public spherical
    Lambert equations (Snyder, 'Map Projections — A Working Manual',
    USGS PP 1395, eqs. 15-1..15-11); tangent cones (latin1 == latin2)
    use n = sin(latin1)."""
    rad = np.pi / 180.0
    p1, p2 = latin1 * rad, latin2 * rad
    if latin1 == latin2:
        cn = np.sin(p1)
    else:
        cn = (np.log(np.cos(p1) / np.cos(p2))
              / np.log(np.tan(np.pi / 4 + p2 / 2)
                       / np.tan(np.pi / 4 + p1 / 2)))
    cf = np.cos(p1) * np.tan(np.pi / 4 + p1 / 2) ** cn / cn
    rho = lambda phi: (radius * cf                         # noqa: E731
                       / np.tan(np.pi / 4 + phi / 2) ** cn)
    rho0 = rho(lad * rad)
    r1 = rho(la1 * rad)
    th1 = cn * (lo1 - lov) * rad
    x1, y1 = r1 * np.sin(th1), rho0 - r1 * np.cos(th1)
    x = x1 + dx * np.arange(ni)
    y = y1 + dy * np.arange(nj)
    xg, yg = np.meshgrid(x, y)                   # (nj, ni)
    # plain sqrt-of-squares, not np.hypot: the oracle SQL writes
    # sqrt(x*x + (rho0-y)*(rho0-y)) and hypot's extra-precision path
    # can differ in the last ulp — mirror the exact operation sequence
    # (same convention as spaceview_latlon below)
    dyg = rho0 - yg
    rg = np.sqrt(xg * xg + dyg * dyg) * np.sign(cn)
    tg = np.arctan2(xg, rho0 - yg)
    lat = (2 * np.arctan((radius * cf / rg) ** (1.0 / cn))
           - np.pi / 2) / rad
    lon = lov + tg / cn / rad
    return lat, lon


_GAUSS_LAT_CACHE: dict[int, np.ndarray] = {}


def gaussian_latitudes(n: int) -> np.ndarray:
    """The 2N regular-Gaussian-grid latitudes (degrees, north→south):
    arcsines of the Legendre-polynomial P_2N roots — the quadrature
    nodes ECMWF's N-series grids are defined on (public WMO template
    3.40 / ECMWF grid documentation). Memoized per N: the leggauss
    eigensolve was the DOMINANT per-message cost of reduced-Gaussian
    parse/build, yet the nodes are a pure function of the grid size
    (an ingest run sees a handful of N values across millions of
    messages)."""
    n = int(n)
    got = _GAUSS_LAT_CACHE.get(n)
    if got is None:
        nodes, _w = np.polynomial.legendre.leggauss(2 * n)
        got = np.degrees(np.arcsin(nodes))[::-1].copy()
        if len(_GAUSS_LAT_CACHE) < 1024:
            _GAUSS_LAT_CACHE[n] = got
    return got.copy()       # callers own their array; cache stays pure


def parse_grib2(data: bytes) -> list[dict]:
    """Parse every GRIB2 message in ``data`` → list of dicts with
    keys: discipline, ref_time (ISO string), param_category,
    param_number, forecast_hours, ni, nj, la1, lo1, dlat, dlon
    (degrees), template (packing), values ((nj, ni) float64 with NaN
    where the bitmap masks)."""
    out = []
    pos = 0
    while pos < len(data):
        if data[pos:pos + 4] != b"GRIB":
            raise ValueError("GRIB2 message without GRIB magic")
        discipline = data[pos + 6]
        edition = data[pos + 7]
        if edition != 2:
            raise NotImplementedError(f"GRIB edition {edition} "
                                      "(edition 2 only)")
        (total_len,) = struct.unpack_from(">Q", data, pos + 8)
        msg = data[pos:pos + total_len]
        if len(msg) < total_len:
            raise ValueError("GRIB2 message truncated")
        if msg[-4:] != b"7777":
            raise ValueError("GRIB2 message missing 7777 trailer")
        out.extend(_parse_message(msg, discipline))
        pos += total_len
    if not out:
        raise ValueError("no GRIB2 messages in payload")
    return out


def _parse_message(msg: bytes, discipline: int) -> list[dict]:
    """One GRIB…7777 envelope → one rec per FIELD: the spec allows
    sections 2-7 to repeat inside a message (each section 7 closes a
    field), unrepeated sections carrying over — so the walk snapshots
    the live section set at every section 7. A bitmap indicator 254
    ('previously defined bitmap applies') reuses the last explicit
    bitmap through the shared carry."""
    p = 16                              # past section 0
    cur: dict[int, bytes] = {}
    snapshots: list[dict[int, bytes]] = []
    while p < len(msg) - 4:
        (slen,) = struct.unpack_from(">I", msg, p)
        snum = msg[p + 4]
        if slen < 5 or not 1 <= snum <= 7:
            raise ValueError("GRIB2 section chain desynchronized")
        cur[snum] = msg[p:p + slen]
        p += slen
        if snum == 7:
            snapshots.append(dict(cur))
    if not snapshots:
        raise ValueError("GRIB2 message missing section 7")
    carry: dict = {}
    return [_parse_field(sec, discipline, carry) for sec in snapshots]


_EARTH_RADII = {0: 6367470.0, 6: 6371229.0}


def _parse_lambert_grid(s3: bytes, rec: dict, ni: int, nj: int) -> None:
    """Template 3.30 (Lambert conformal) section-3 fields → per-cell
    ``lat2d``/``lon2d`` degree arrays in STORAGE order via the
    spherical inverse projection (``lambert_latlon``). Regional NWP
    archives (HRRR/NAM) are this template; scan mode +x+y (0x40) and
    the northern projection centre are the operational layout — other
    combinations stay loud."""
    earth = s3[14]
    radius = _EARTH_RADII.get(earth)
    if radius is None:
        raise NotImplementedError(
            f"GRIB2 Lambert grid with earth-shape code {earth} "
            "(spherical codes 0/6 only)")
    la1 = _sm_int(struct.unpack_from(">I", s3, 38)[0], 32) / 1e6
    lo1 = struct.unpack_from(">I", s3, 42)[0] / 1e6
    lad = _sm_int(struct.unpack_from(">I", s3, 47)[0], 32) / 1e6
    lov = struct.unpack_from(">I", s3, 51)[0] / 1e6
    dx = struct.unpack_from(">I", s3, 55)[0] / 1e3      # mm → m
    dy = struct.unpack_from(">I", s3, 59)[0] / 1e3
    centre = s3[63]
    scan = s3[64]
    latin1 = _sm_int(struct.unpack_from(">I", s3, 65)[0], 32) / 1e6
    latin2 = _sm_int(struct.unpack_from(">I", s3, 69)[0], 32) / 1e6
    if centre & 0x80:
        raise NotImplementedError(
            "GRIB2 Lambert grid with the SOUTH pole on the projection "
            "plane (northern-centre cones only)")
    if scan != 0x40:
        raise NotImplementedError(
            f"GRIB2 Lambert scanning mode 0x{scan:02X} (+x+y 0x40 "
            "only)")
    lat2d, lon2d = lambert_latlon(ni, nj, la1, lo1, lad, lov, dx, dy,
                                  latin1, latin2, radius)
    rec.update(ni=ni, nj=nj, la1=la1, lo1=lo1, la2=0.0, lo2=0.0,
               dlat=0.0, dlon=0.0, lats=lat2d[:, 0],
               lat2d=lat2d, lon2d=lon2d, lad=lad, lov=lov,
               latin1=latin1, latin2=latin2, dx_m=dx, dy_m=dy)


def _spectral_mn(j: int, m: int) -> tuple[np.ndarray, np.ndarray,
                                          np.ndarray]:
    """Sequence metadata for a triangular-truncation coefficient
    stream (the ECMWF order): for m = 0..M, n = m..J, parts
    (real, imag) — returns per-VALUE (m, n, part) arrays."""
    ms, ns = [], []
    for mm in range(m + 1):
        for nn in range(mm, j + 1):
            ms += [mm, mm]
            ns += [nn, nn]
    part = np.tile(np.array([0, 1], np.int64), len(ms) // 2)
    return np.array(ms, np.int64), np.array(ns, np.int64), part


def _parse_spectral_field(sec: dict[int, bytes], rec: dict) -> dict:
    """Sections 4/5/7 of a spherical-harmonic field (grid 3.50, data
    5.50 simple / 5.51 complex packing with Laplacian scaling and an
    IEEE-float unpacked sub-truncation). ``rec['values']`` is the
    1-D coefficient sequence; ``rec['spectral'] = True``."""
    s4 = sec[4]
    (ptemplate,) = struct.unpack_from(">H", s4, 7)
    if ptemplate != 0:
        raise NotImplementedError(
            f"GRIB2 spectral product template 4.{ptemplate} "
            "(4.0 only)")
    rec["param_category"] = s4[9]
    rec["param_number"] = s4[10]
    rec["forecast_hours"] = struct.unpack_from(">I", s4, 18)[0]

    s5 = sec[5]
    (n_points,) = struct.unpack_from(">I", s5, 5)
    (dtemplate,) = struct.unpack_from(">H", s5, 9)
    (ref,) = struct.unpack_from(">f", s5, 11)
    e = _sm_int(struct.unpack_from(">H", s5, 15)[0], 16)
    d = _sm_int(struct.unpack_from(">H", s5, 17)[0], 16)
    nbits = s5[19]
    rec["template"] = f"5.{dtemplate}"
    if 6 in sec and sec[6][5] != 255:
        raise NotImplementedError("GRIB2 spectral field with a bitmap")
    mlist, nlist, part = _spectral_mn(rec["spectral_j"],
                                      rec["spectral_m"])
    if mlist.size != n_points:
        raise ValueError(
            f"GRIB2 spectral point count {n_points} disagrees with "
            f"the J={rec['spectral_j']} truncation ({mlist.size})")
    s7 = sec[7]
    if dtemplate == 50:
        x = _unpack_bits(s7[5:], nbits, n_points)
        y = (ref + x.astype(np.float64) * (2.0 ** e)) / (10.0 ** d)
    elif dtemplate == 51:
        p_lap = _sm_int(struct.unpack_from(">I", s5, 20)[0], 32) / 1e6
        js, ks, ms_ = struct.unpack_from(">HHH", s5, 24)
        (ts,) = struct.unpack_from(">I", s5, 30)
        prec = s5[34]
        if prec != 1:
            raise NotImplementedError(
                f"GRIB2 spectral subset precision code {prec} "
                "(IEEE 32-bit = 1 only)")
        subset = (mlist <= ms_) & (nlist <= js)
        if int(subset.sum()) != ts:
            raise ValueError("GRIB2 spectral sub-truncation count "
                             "disagrees with Ts")
        floats = np.frombuffer(s7[5:5 + 4 * ts], ">f4").astype(
            np.float64)
        x = _unpack_bits(s7[5 + 4 * ts:], nbits, n_points - ts)
        ypk = (ref + x.astype(np.float64) * (2.0 ** e)) / (10.0 ** d)
        nn = nlist[~subset]
        lam = (nn * (nn + 1)).astype(np.float64)
        if float(p_lap).is_integer():
            # exact integer Laplacian powers (the oracle-checkable
            # classes): (n(n+1))^p as exact ints → one IEEE division
            factor = ((nn * (nn + 1)).astype(object)
                      ** int(p_lap)).astype(np.float64)
        else:
            factor = lam ** p_lap
        y = np.empty(n_points, np.float64)
        y[subset] = floats
        y[~subset] = ypk / factor
    else:
        raise NotImplementedError(
            f"GRIB2 spectral data representation template "
            f"5.{dtemplate} (5.50 simple / 5.51 complex only)")
    rec["spectral"] = True
    rec["values"] = y
    rec["coeff_m"], rec["coeff_n"], rec["coeff_part"] = \
        mlist, nlist, part
    return rec


def spaceview_latlon(ni: int, nj: int, lop: float, dx: int, dy: int,
                     xp: float, yp: float, nr: int,
                     radius: float = 6371229.0):
    """Per-cell (lat, lon, on_disk) for a geostationary space-view
    grid (template 3.90, spherical earth, sub-satellite latitude 0,
    scan +x+y): normalized geostationary projection inverse (the
    public CGMS LRIT/HRIT / GOES-R PUG equations, spherical case —
    the intersection quadratic has a = 1). Off-disk pixels (negative
    discriminant) come back NaN with ``on_disk`` False."""
    h = nr * 1e-6 * radius
    step = 2.0 * np.arcsin(1e6 / nr)
    x = (np.arange(ni) - xp) * (step / dx)
    y = (np.arange(nj) - yp) * (step / dy)
    xg, yg = np.meshgrid(x, y)                    # (nj, ni)
    cxy = np.cos(xg) * np.cos(yg)
    disc = h * h * cxy * cxy - (h * h - radius * radius)
    on = disc > 0
    rs = np.where(on, h * cxy - np.sqrt(np.where(on, disc, 0.0)),
                  np.nan)
    # grouping is deliberate and mirrored EXACTLY by the SQL oracle
    # (plain sqrt-of-squares, not hypot; sz multiplies the
    # precomputed cos·sin) so both engines run the same IEEE ops
    sx = rs * cxy
    sy = -rs * np.sin(xg)
    sz = rs * (np.cos(xg) * np.sin(yg))
    lat = np.degrees(np.arctan(
        sz / np.sqrt((h - sx) * (h - sx) + sy * sy)))
    lon = lop - np.degrees(np.arctan(sy / (h - sx)))
    lat[~on] = np.nan
    lon[~on] = np.nan
    return lat, lon, on


def _parse_spaceview_grid(s3: bytes, rec: dict, ni: int,
                          nj: int) -> None:
    """Template 3.90 (space view / geostationary) section-3 fields →
    per-cell ``lat2d``/``lon2d`` + the on-disk mask. EUMETSAT/GOES
    full-disk products are this template; spherical earth,
    sub-satellite latitude 0, scan +x+y, zero orientation/offsets —
    other combinations stay loud."""
    earth = s3[14]
    radius = _EARTH_RADII.get(earth)
    if radius is None:
        raise NotImplementedError(
            f"GRIB2 space-view grid with earth-shape code {earth} "
            "(spherical codes 0/6 only)")
    lap = _sm_int(struct.unpack_from(">I", s3, 38)[0], 32) / 1e6
    lop = struct.unpack_from(">I", s3, 42)[0] / 1e6
    dx = struct.unpack_from(">I", s3, 47)[0]
    dy = struct.unpack_from(">I", s3, 51)[0]
    xp = struct.unpack_from(">I", s3, 55)[0] / 1e3
    yp = struct.unpack_from(">I", s3, 59)[0] / 1e3
    scan = s3[63]
    (orient,) = struct.unpack_from(">I", s3, 64)
    (nr,) = struct.unpack_from(">I", s3, 68)
    xo, yo = struct.unpack_from(">II", s3, 72)
    if lap != 0.0:
        raise NotImplementedError(
            "GRIB2 space-view with nonzero sub-satellite latitude")
    if scan != 0x40:
        raise NotImplementedError(
            f"GRIB2 space-view scanning mode 0x{scan:02X} (+x+y 0x40 "
            "only)")
    if orient or xo or yo:
        raise NotImplementedError(
            "GRIB2 space-view with grid orientation / origin offsets")
    if nr == 0xFFFFFFFF:
        raise NotImplementedError(
            "GRIB2 space-view from infinite distance (orthographic)")
    lat2d, lon2d, on = spaceview_latlon(ni, nj, lop, int(dx), int(dy),
                                        xp, yp, int(nr), radius)
    rec.update(ni=ni, nj=nj, la1=0.0, lo1=lop, la2=0.0, lo2=0.0,
               dlat=0.0, dlon=0.0, lats=lat2d[:, 0],
               lat2d=lat2d, lon2d=lon2d, offdisk=~on,
               lop=lop, nr=int(nr))


def _parse_field(sec: dict[int, bytes], discipline: int,
                 carry: dict) -> dict:
    rec: dict = {"discipline": discipline}
    for need in (1, 3, 4, 5, 7):
        if need not in sec:
            raise ValueError(f"GRIB2 message missing section {need}")

    s1 = sec[1]
    year, = struct.unpack_from(">H", s1, 12)
    rec["ref_time"] = (f"{year:04d}-{s1[14]:02d}-{s1[15]:02d} "
                       f"{s1[16]:02d}:{s1[17]:02d}:{s1[18]:02d}")

    s3 = sec[3]
    (gtemplate,) = struct.unpack_from(">H", s3, 12)
    if gtemplate not in (0, 30, 40, 50, 90):
        raise NotImplementedError(
            f"GRIB2 grid template 3.{gtemplate} not supported "
            "(3.0 regular / 3.30 Lambert conformal / 3.40 Gaussian "
            "lat/lon / 3.50 spherical harmonics / 3.90 space view "
            "only)")
    if gtemplate == 50:
        # spherical harmonic coefficients: J, K, M pentagonal
        # resolution parameters + representation type/mode — there is
        # no lat/lon grid; the field is the coefficient sequence
        j_, k_, m_ = struct.unpack_from(">III", s3, 14)
        rep_type, rep_mode = s3[26], s3[27]
        if rep_type != 1:
            raise NotImplementedError(
                f"GRIB2 spectral representation type {rep_type} "
                "(associated Legendre = 1 only)")
        if not (j_ == k_ == m_):
            raise NotImplementedError(
                "GRIB2 spectral pentagonal truncation with J != K != "
                "M (triangular truncation only)")
        rec.update(spectral_j=int(j_), spectral_k=int(k_),
                   spectral_m=int(m_), spectral_mode=int(rep_mode),
                   ni=0, nj=0, la1=0.0, lo1=0.0, la2=0.0, lo2=0.0,
                   dlat=0.0, dlon=0.0, lats=None)
        scan = 0
        pl = None
        ni = nj = 0
        return _parse_spectral_field(sec, rec)
    ni, nj = struct.unpack_from(">II", s3, 30)
    if gtemplate == 30:
        _parse_lambert_grid(s3, rec, int(ni), int(nj))
        scan = 0x40                      # +x+y, enforced in the parse
        pl = None
    elif gtemplate == 90:
        _parse_spaceview_grid(s3, rec, int(ni), int(nj))
        scan = 0x40
        pl = None
    else:
        la1 = _sm_int(struct.unpack_from(">I", s3, 46)[0], 32) / 1e6
        lo1 = struct.unpack_from(">I", s3, 50)[0] / 1e6
        la2 = _sm_int(struct.unpack_from(">I", s3, 55)[0], 32) / 1e6
        lo2 = struct.unpack_from(">I", s3, 59)[0] / 1e6
        dlon = struct.unpack_from(">I", s3, 63)[0] / 1e6
        scan = s3[71]
    pl = None
    if gtemplate == 40:
        # octets 68-71 carry N (parallels pole→equator), not Dj: the
        # nj = 2N grid latitudes are the Gaussian quadrature nodes
        (n_par,) = struct.unpack_from(">I", s3, 67)
        if scan != 0x00:
            raise NotImplementedError(
                "GRIB2 Gaussian grids support scan mode 0x00 only")
        if nj != 2 * n_par:
            raise NotImplementedError(
                f"GRIB2 Gaussian grid with Nj={nj} != 2N={2 * n_par} "
                "(latitude-band subsets unsupported)")
        if ni == 0xFFFFFFFF:
            # REDUCED Gaussian grid (ERA5's native layout): Ni is
            # 'missing' and section 3's optional list carries one
            # point count per parallel (octet 11 = list item width,
            # octet 12 = interpretation 1)
            lw, interp = s3[10], s3[11]
            if interp != 1 or lw not in (2, 4):
                raise NotImplementedError(
                    f"GRIB2 reduced grid with list interpretation "
                    f"{interp} / item width {lw} (parallels list of "
                    "2- or 4-octet counts only)")
            pl = np.array(struct.unpack_from(
                f">{int(nj)}{'H' if lw == 2 else 'I'}", s3, 72),
                np.int64)
            if pl.min() < 1:
                raise ValueError("GRIB2 reduced grid with an empty "
                                 "parallel")
            rec["pl"] = pl
        dlat = 0.0
        lats = gaussian_latitudes(int(n_par))
        rec["gaussian_n"] = int(n_par)
    elif gtemplate == 0:
        dlat = struct.unpack_from(">I", s3, 67)[0] / 1e6
        if scan not in (0x00, 0x40):
            raise NotImplementedError(
                f"GRIB2 scanning mode 0x{scan:02X} not supported")
        # the grid is normalized north-first for BOTH scan modes (see
        # the flip below); the northern edge is la1 for -y scans and
        # la2 for +y scans
        lats = max(la1, la2) - dlat * np.arange(int(nj))
    if gtemplate not in (30, 90):
        rec.update(ni=int(ni), nj=int(nj), la1=la1, lo1=lo1, la2=la2,
                   lo2=lo2, dlat=dlat, dlon=dlon, lats=lats)

    s4 = sec[4]
    (ptemplate,) = struct.unpack_from(">H", s4, 7)
    if ptemplate not in (0, 8):
        raise NotImplementedError(
            f"GRIB2 product template 4.{ptemplate} not supported "
            "(4.0 analysis/forecast and 4.8 statistical interval only)")
    rec["param_category"] = s4[9]
    rec["param_number"] = s4[10]
    rec["forecast_hours"] = struct.unpack_from(">I", s4, 18)[0]
    if ptemplate == 8:
        # octets 35-41: end of the overall time interval; 42: number
        # of time-range specs; 47: statistical process of the first
        # (outermost) spec — 0 avg, 1 accumulation, 2 max, 3 min
        (ey,) = struct.unpack_from(">H", s4, 34)
        rec["interval_end"] = (f"{ey:04d}-{s4[36]:02d}-{s4[37]:02d} "
                               f"{s4[38]:02d}:{s4[39]:02d}:{s4[40]:02d}")
        n_ranges = s4[41]
        if n_ranges < 1:
            raise ValueError("GRIB2 template 4.8 with zero time-range "
                             "specifications")
        rec["stat_process"] = s4[46]
        rec["stat_hours"] = struct.unpack_from(">I", s4, 49)[0]

    s5 = sec[5]
    (n_points,) = struct.unpack_from(">I", s5, 5)
    (dtemplate,) = struct.unpack_from(">H", s5, 9)
    (ref,) = struct.unpack_from(">f", s5, 11)
    e = _sm_int(struct.unpack_from(">H", s5, 15)[0], 16)
    d = _sm_int(struct.unpack_from(">H", s5, 17)[0], 16)
    nbits = s5[19]
    rec["template"] = f"5.{dtemplate}"

    n_grid = int(pl.sum()) if pl is not None else int(ni * nj)
    bitmap = None
    if 6 in sec:
        s6 = sec[6]
        ind = s6[5]
        if ind == 0:
            bitmap = np.unpackbits(
                np.frombuffer(s6[6:], np.uint8),
                count=n_grid).astype(bool)
            carry["bitmap"] = bitmap
        elif ind == 254:                # previously defined bitmap
            bitmap = carry.get("bitmap")
            if bitmap is None or bitmap.size != n_grid:
                raise ValueError(
                    "GRIB2 bitmap indicator 254 without a matching "
                    "previously-defined bitmap in this message")
        elif ind != 255:
            raise NotImplementedError(
                f"GRIB2 bitmap indicator {ind} (0/254/255 only)")
    n_data = int(bitmap.sum()) if bitmap is not None else n_grid
    if n_points != n_data:
        raise ValueError("GRIB2 section-5 point count disagrees with "
                         "grid/bitmap")

    s7 = sec[7]
    emb_miss = None
    if dtemplate == 0:
        x = _unpack_bits(s7[5:], nbits, n_data)
    elif dtemplate in (2, 3):           # complex (+spatial diff)
        x, emb_miss = _unpack_complex(s5, s7[5:], n_data, nbits,
                                      dtemplate)
    elif dtemplate == 40:               # JPEG 2000 packing
        from .j2k import decode_j2k
        img, _info = decode_j2k(bytes(s7[5:]))
        x = img.astype(np.int64).reshape(-1)
        if x.size != n_data:
            raise ValueError("GRIB2 JPEG2000-packed field size "
                             f"{x.size} != point count {n_data}")
    elif dtemplate == 41:               # PNG packing
        from ..operators.png import png_pixels
        px, _ctype = png_pixels(bytes(s7[5:]))
        x = px[:, :, 0].astype(np.int64).reshape(-1)[:n_data]
        if x.size < n_data:
            raise ValueError("GRIB2 PNG-packed field smaller than the "
                             "point count")
    elif dtemplate == 42:               # CCSDS/AEC packing
        # template 5.42: octet 22 = CCSDS (libaec) flags, 23 = block
        # size, 24-25 = reference sample interval in blocks; section 7
        # is a CCSDS 121.0-B-2 stream — the same adaptive-entropy
        # coder as the HDF5 szip filter, decoded through
        # ``sources/szip.py`` with the AEC framing translated
        from .szip import NN_OPTION_MASK, szip_decode
        aec_flags = s5[21]
        block = s5[22]
        (rsi,) = struct.unpack_from(">H", s5, 23)
        if aec_flags & 0x01:            # AEC_DATA_SIGNED
            raise NotImplementedError(
                "GRIB2 CCSDS packing with signed samples")
        if aec_flags & 0x10:            # AEC_RESTRICTED
            raise NotImplementedError(
                "GRIB2 CCSDS restricted low-entropy coding")
        if not aec_flags & 0x04:        # AEC_DATA_MSB absent
            raise NotImplementedError(
                "GRIB2 CCSDS packing with LSB-first samples")
        if aec_flags & 0x02:            # AEC_DATA_3BYTE
            raise NotImplementedError(
                "GRIB2 CCSDS packing with 3-byte sample storage")
        opts = NN_OPTION_MASK if aec_flags & 0x08 else 0
        x = szip_decode(bytes(s7[5:]), opts, nbits, block,
                        rsi * block, n_data,
                        pad_scanline=bool(aec_flags & 0x20))
    else:
        raise NotImplementedError(
            f"GRIB2 data representation template 5.{dtemplate} not "
            "supported (5.0 simple / 5.2 complex / 5.3 complex+"
            "spatial-diff / 5.40 JPEG2000 / 5.41 PNG / 5.42 CCSDS "
            "only)")
    y = (ref + x.astype(np.float64) * (2.0 ** e)) / (10.0 ** d)
    if emb_miss is not None:
        # embedded-missing points (management 1/2) land as NaN — the
        # same absent-cell ingest contract as bitmap-masked cells
        y[emb_miss] = np.nan

    values = np.full(n_grid, np.nan)
    if bitmap is not None:
        values[bitmap] = y
    else:
        values[:] = y
    if pl is not None:
        # reduced grids are inherently ragged: values stay the
        # row-major 1-D point stream; rec["pl"] names each parallel's
        # point count (scan 0x00 enforced above)
        rec["values"] = values
        return rec
    grid = values.reshape(nj, ni)
    # regular lat/lon grids are normalized north-first; Lambert and
    # space view keep STORAGE order (lat2d/lon2d are per stored cell)
    if scan == 0x40 and gtemplate == 0:  # +y scanning: south-to-north
        grid = grid[::-1]
    if "offdisk" in rec:
        # space view: pixels beyond the limb have no geolocation or
        # physical value — absent cells, like a bitmap mask
        grid = grid.copy()
        grid[rec["offdisk"]] = np.nan
    rec["values"] = grid
    return rec


def _section(num: int, body: bytes) -> bytes:
    return struct.pack(">IB", 5 + len(body), num) + body


def build_grib2(values: np.ndarray, ref: float = 0.0,
                binary_scale: int = 0, decimal_scale: int = 0,
                nbits: int = 8, la1: float = -60.0, lo1: float = 10.0,
                dlat: float = 0.5, dlon: float = 0.5,
                ref_time: tuple = (2020, 1, 1, 0, 0, 0),
                param: tuple = (0, 0), forecast_hours: int = 0,
                bitmap: np.ndarray | None = None,
                png_packed: bool = False,
                jpeg2000_packed: bool = False,
                aec_packed: bool = False,
                aec_block: int = 16, aec_rsi: int = 8,
                aec_pad_rsi: bool = False,
                complex_packed: bool = False,
                spatial_diff_order: int = 0,
                group_size: int = 8,
                discipline: int = 0,
                gaussian: bool = False,
                reduced_pl=None,
                stat: tuple | None = None,
                scan_positive_y: bool = False,
                missing_primary: np.ndarray | None = None,
                missing_secondary: np.ndarray | None = None,
                lambert: dict | None = None,
                spaceview: dict | None = None) -> bytes:
    """Assemble one spec-shaped GRIB2 message from an (nj, ni) grid of
    PACKED integer values X (the stored field is
    ``(ref + X·2^binary_scale)/10^decimal_scale``). ``bitmap`` is an
    optional (nj, ni) bool grid of PRESENT cells — X then supplies
    only the present cells, row-major. ``png_packed`` emits data
    representation template 5.41 (values as an 8-bit grayscale PNG)
    instead of 5.0 simple packing. ``complex_packed`` emits template
    5.2 (general group splitting into runs of ``group_size`` points,
    per-group reference + width); with ``spatial_diff_order`` 1 or 2
    it emits template 5.3 (values differenced before grouping, first
    value(s) and overall minimum carried as sign-magnitude extra
    descriptors in section 7). ``gaussian`` emits grid template 3.40
    (regular Gaussian: nj must be even, N = nj/2 in octets 68-71,
    la1/la2 = the first/last quadrature latitudes; ``la1``/``dlat``
    args are ignored). ``stat=(process, hours, end_time)`` emits
    product template 4.8 (statistics over a time interval: process 0
    avg / 1 accumulation / 2 max / 3 min, interval length in hours,
    ``end_time`` a (y, mo, d, h, mi, s) tuple) instead of 4.0.
    ``scan_positive_y`` stores the grid
    south-to-north (scan mode 0x40): the SAME (nj, ni) input is still
    interpreted north-first — rows are flipped on write and ``la1``
    becomes the SOUTHERN edge, as real +y archives encode it.
    ``missing_primary``/``missing_secondary`` (bool grids shaped like
    ``values``; require ``complex_packed``) arm template 5.2/5.3
    missing-value management 1/2: masked points are embedded in-group
    as the all-ones markers (value at masked slots ignored) — the
    no-bitmap sentinel encoding accumulation products use.
    ``lambert`` emits grid template 3.30 (Lambert conformal, sphere):
    a dict with ``lad``, ``lov``, ``latin1``, ``latin2`` (degrees),
    ``dx``, ``dy`` (metres); ``la1``/``lo1`` args anchor the first
    grid point, scan mode is +x+y (0x40) as regional NWP archives
    (HRRR/NAM) encode it, and ``dlat``/``dlon`` args are ignored."""
    vals = np.asarray(values, np.int64)
    if (missing_primary is not None or missing_secondary is not None) \
            and not complex_packed:
        raise ValueError("missing-value management is a template "
                         "5.2/5.3 feature — pass complex_packed=True")
    if lambert is not None and (gaussian or reduced_pl is not None
                                or bitmap is not None or png_packed
                                or scan_positive_y):
        raise ValueError("lambert grids here are plain (nj, ni) "
                         "fields (simple or complex packed)")
    if spaceview is not None and (gaussian or reduced_pl is not None
                                  or bitmap is not None or png_packed
                                  or scan_positive_y
                                  or lambert is not None):
        raise ValueError("spaceview grids here are plain (nj, ni) "
                         "fields (simple or complex packed)")
    if scan_positive_y:
        if bitmap is not None or png_packed:
            raise ValueError("scan_positive_y supports plain "
                             "simple-packed grids")
        vals = vals[::-1]               # stored south-to-north
    if reduced_pl is not None:
        if not gaussian or bitmap is not None or scan_positive_y:
            raise ValueError("reduced_pl wants gaussian=True and a "
                             "plain 1-D point stream")
        reduced_pl = np.asarray(reduced_pl, np.int64)
        nj, ni = int(reduced_pl.size), None
        if vals.ndim != 1 or vals.size != int(reduced_pl.sum()):
            raise ValueError("reduced grid values must be the 1-D "
                             "row-major stream of sum(pl) points")
        n_data = int(vals.size)
    else:
        nj, ni = (bitmap.shape if bitmap is not None else vals.shape)
        n_data = int(bitmap.sum()) if bitmap is not None \
            else int(vals.size)
    flat = vals.reshape(-1)
    if bitmap is not None and flat.size != n_data:
        raise ValueError("values must cover exactly the bitmap's "
                         "present cells")

    y, mo, dd, hh, mi, ss = ref_time
    s1 = (struct.pack(">HHBBB", 0, 0, 2, 1, 1)
          + struct.pack(">HBBBBB", y, mo, dd, hh, mi, ss)
          + bytes([0, 1]))

    # scan 0x00 runs north→south (la1 = northern edge); 0x40 runs
    # south→north (caller's la1 still names the north edge — it moves
    # to la2 and the southern edge becomes la1, the +y convention)
    if gaussian:
        if scan_positive_y or bitmap is not None:
            raise ValueError("gaussian grids support plain north-first "
                             "full grids here")
        if nj % 2:
            raise ValueError("regular Gaussian grid wants an even Nj "
                             "(= 2N parallels)")
        glats = gaussian_latitudes(nj // 2)
        la1, la2 = float(glats[0]), float(glats[-1])
        dj_field = nj // 2                           # octets 68-71 = N
        gtemplate = 40
    else:
        if scan_positive_y:
            la1, la2 = la1 - dlat * (nj - 1), la1
        else:
            la2 = la1 - dlat * (nj - 1)
        dj_field = round(dlat * 1e6)
        gtemplate = 0
    if reduced_pl is not None:
        lo2 = 0.0
        dlon = 0.0
        list_hdr = bytes([4, 1])        # 4-octet counts, interp 1
        ni_field = 0xFFFFFFFF           # Ni 'missing' for reduced
        pl_tail = b"".join(struct.pack(">I", int(k))
                           for k in reduced_pl)
    else:
        lo2 = lo1 + dlon * (ni - 1)
        list_hdr = bytes([0, 0])
        ni_field = ni
        pl_tail = b""
    if spaceview is not None:
        g = (bytes([0]) + struct.pack(">I", ni * nj) + bytes([0, 0])
             + struct.pack(">H", 90)                 # 3.90 space view
             + bytes([6]) + bytes(15)                # spherical earth
             + struct.pack(">II", ni, nj)
             + struct.pack(">I", 0)                  # Lap = 0
             + struct.pack(">I", round(spaceview["lop"] * 1e6))
             + bytes([0x30])                         # resolution flags
             + struct.pack(">I", int(spaceview["dx"]))
             + struct.pack(">I", int(spaceview["dy"]))
             + struct.pack(">I", round(spaceview["xp"] * 1e3))
             + struct.pack(">I", round(spaceview["yp"] * 1e3))
             + bytes([0x40])                         # scan +x +y
             + struct.pack(">I", 0)                  # orientation
             + struct.pack(">I", int(spaceview["nr"]))
             + struct.pack(">II", 0, 0))             # Xo, Yo
    elif lambert is not None:
        g = (bytes([0]) + struct.pack(">I", ni * nj) + bytes([0, 0])
             + struct.pack(">H", 30)                 # 3.30 Lambert
             + bytes([6]) + bytes(15)                # spherical earth
             + struct.pack(">II", ni, nj)
             + struct.pack(">I", _sm_enc(round(la1 * 1e6), 32))
             + struct.pack(">I", round(lo1 * 1e6))
             + bytes([0x30])                         # resolution flags
             + struct.pack(">I", _sm_enc(round(lambert["lad"] * 1e6),
                                         32))
             + struct.pack(">I", round(lambert["lov"] * 1e6))
             + struct.pack(">I", round(lambert["dx"] * 1e3))   # mm
             + struct.pack(">I", round(lambert["dy"] * 1e3))
             + bytes([0])                            # centre: N pole
             + bytes([0x40])                         # scan +x +y
             + struct.pack(">I", _sm_enc(round(lambert["latin1"] * 1e6),
                                         32))
             + struct.pack(">I", _sm_enc(round(lambert["latin2"] * 1e6),
                                         32))
             + struct.pack(">I", _sm_enc(round(-90 * 1e6), 32))
             + struct.pack(">I", 0))                 # southern pole
    else:
        g = (bytes([0]) + struct.pack(">I", n_data if reduced_pl is not None
                                      else ni * nj) + list_hdr
             + struct.pack(">H", gtemplate)              # 3.0 / 3.40
             + bytes([6]) + bytes(15)                    # spherical earth
             + struct.pack(">II", ni_field, nj)
             + struct.pack(">II", 0, 0)                  # basic angle
             + struct.pack(">I", _sm_enc(round(la1 * 1e6), 32))
             + struct.pack(">I", round(lo1 * 1e6))
             + bytes([0x30])                             # resolution flags
             + struct.pack(">I", _sm_enc(round(la2 * 1e6), 32))
             + struct.pack(">I", round(lo2 * 1e6))
             + struct.pack(">I", round(dlon * 1e6))
             + struct.pack(">I", dj_field)
             + bytes([0x40 if scan_positive_y else 0x00])
             + pl_tail)
    s4 = (struct.pack(">H", 0)
          + struct.pack(">H", 8 if stat is not None else 0)
          + bytes([param[0], param[1], 0, 0, 0]) + struct.pack(">H", 0)
          + bytes([0, 1]) + struct.pack(">I", forecast_hours)
          + bytes([1, 0]) + struct.pack(">I", 0)
          + bytes([255, 0]) + struct.pack(">I", 0))
    if stat is not None:
        process, hours, end_time = stat
        ey, emo, ed, eh, emi, es = end_time
        s4 += (struct.pack(">H", ey)
               + bytes([emo, ed, eh, emi, es])
               + bytes([1])                          # 1 time range
               + struct.pack(">I", 0)                # no missing
               + bytes([process, 2, 1])              # incr type, hours
               + struct.pack(">I", hours)
               + bytes([1]) + struct.pack(">I", 0))
    if sum((complex_packed, png_packed, jpeg2000_packed,
            aec_packed)) > 1:
        raise ValueError("pick one of complex_packed / png_packed / "
                         "jpeg2000_packed / aec_packed")
    s5_tail = b""
    if aec_packed:
        # template 5.42: flags = AEC_DATA_MSB | AEC_DATA_PREPROCESS
        # (+ AEC_PAD_RSI), block size, 2-octet reference interval
        from .szip import NN_OPTION_MASK, szip_encode
        if flat.size and (int(flat.min()) < 0
                          or int(flat.max()) >> nbits):
            raise ValueError(f"CCSDS packing wants values in "
                             f"[0, 2^{nbits})")
        aec_flags = 0x04 | 0x08 | (0x20 if aec_pad_rsi else 0)
        packed = szip_encode(flat, NN_OPTION_MASK, nbits, aec_block,
                             aec_rsi * aec_block,
                             pad_scanline=aec_pad_rsi)
        dtemplate = 42
        s5_tail = bytes([aec_flags, aec_block]) \
            + struct.pack(">H", aec_rsi)
    elif jpeg2000_packed:
        # template 5.40: octet 22 = original field type, 23 =
        # compression type (0 lossless), 24 = ratio (255 for lossless);
        # section 7 = a raw J2K codestream of the field as a grayscale
        # image — (nj, ni) full grids, (1, n_data) under a bitmap (the
        # shape NCEP's g2clib uses for masked fields)
        from .j2k import encode_j2k
        if flat.size and (int(flat.min()) < 0
                          or int(flat.max()) >> nbits):
            raise ValueError(f"JPEG2000 packing wants values in "
                             f"[0, 2^{nbits})")
        shape = (1, n_data) if (bitmap is not None
                                or reduced_pl is not None) \
            else (nj, ni)
        packed = encode_j2k(flat.reshape(shape), depth=nbits,
                            levels=2)
        dtemplate = 40
        s5_tail = bytes([0, 255])       # lossless, ratio N/A
    elif complex_packed:
        dtemplate = 3 if spatial_diff_order else 2
        s5_tail, packed, nbits = _pack_complex(
            flat, group_size, spatial_diff_order,
            miss_primary=(None if missing_primary is None
                          else np.asarray(missing_primary,
                                          bool).reshape(-1)),
            miss_secondary=(None if missing_secondary is None
                            else np.asarray(missing_secondary,
                                            bool).reshape(-1)))
    elif png_packed:
        from ..operators.png import build_gray_png
        if flat.size and (int(flat.max()) > 255 or int(flat.min()) < 0):
            raise ValueError("PNG packing wants 8-bit values")
        packed = build_gray_png(flat.astype(np.uint8).reshape(1, -1))
        dtemplate = 41
    else:
        packed = _pack_bits(flat, nbits)
        dtemplate = 0
    s5 = (struct.pack(">I", n_data)
          + struct.pack(">H", dtemplate)
          + struct.pack(">f", ref)
          + struct.pack(">H", _sm_enc(binary_scale, 16))
          + struct.pack(">H", _sm_enc(decimal_scale, 16))
          + bytes([nbits, 0])
          + s5_tail)
    if bitmap is not None:
        s6 = bytes([0]) + np.packbits(
            bitmap.reshape(-1).astype(np.uint8)).tobytes()
    else:
        s6 = bytes([255])
    s7 = packed

    body = (_section(1, s1) + _section(3, g) + _section(4, s4)
            + _section(5, s5) + _section(6, s6) + _section(7, s7))
    total = 16 + len(body) + 4
    head = (b"GRIB" + bytes([0, 0, discipline, 2])
            + struct.pack(">Q", total))
    return head + body + b"7777"


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

GRIB_LONG_SCHEMA = ("msg_id long, template string, ref_time string, "
                    "param_category int, param_number int, "
                    "lat double, lon double, value double")


def synthesize_grib2(df, id_col: str, text_col: str):
    """Build REAL GRIB2 messages deterministically from text rows:
    8×8 regular lat/lon grids whose packed values derive from the
    cycled UTF-8 text bytes, through five residue classes of
    ``msg_id % 5`` covering the reader's support matrix:

    - 0: 8-bit simple packing, values = bytes
    - 1: 12-bit simple packing, values = 16·byte (a wrong bit width
         or offset shifts every value)
    - 2: 7-bit simple packing with reference 100 and binary scale −1:
         decoded field = 100 + (byte>>1)·0.5 — EXACT halves, so sums
         stay order-independent
    - 3: BITMAP with only even cells present, 8-bit values
    - 4: PNG data representation (template 5.41), values = bytes

    ``la1`` = (msg_id % 121) − 60 exercises the sign-and-magnitude
    microdegree encoding on both hemispheres."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.text import _spread

    def _synth(batches):
        import numpy as np

        def grib(text: str, msg_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            cells = bts[np.arange(64) % len(bts)]
            la1 = float((msg_id % 121) - 60)
            c = msg_id % 5
            if c == 0:
                return build_grib2(cells.reshape(8, 8), nbits=8,
                                   la1=la1)
            if c == 1:
                return build_grib2((cells * 16).reshape(8, 8),
                                   nbits=12, la1=la1)
            if c == 2:
                return build_grib2((cells >> 1).reshape(8, 8), ref=100.0,
                                   binary_scale=-1, nbits=7, la1=la1)
            if c == 3:
                bm = np.zeros(64, bool)
                bm[::2] = True
                return build_grib2(cells[::2], nbits=8,
                                   bitmap=bm.reshape(8, 8), la1=la1)
            return build_grib2(cells.reshape(8, 8), png_packed=True,
                               la1=la1)

        for pdf in batches:
            ids = pdf.iloc[:, 0].astype("int64")
            payloads = [grib(t, i) for t, i in
                        zip(pdf.iloc[:, 1].fillna(""), ids)]
            yield pd.DataFrame({"msg_id": ids, "payload": payloads})

    return (_spread(df).select(F.col(id_col), F.col(text_col))
            .mapInPandas(_synth, schema="msg_id long, payload binary"))


def synthesize_grib2_complex(df, id_col: str, text_col: str):
    """Build REAL complex-packed GRIB2 messages deterministically from
    text rows — the template-5.2/5.3 twin of ``synthesize_grib2``,
    four residue classes of ``msg_id % 4``:

    - 0: template 5.2 with a BITMAP (even cells present), group size 5
         — groups, widths and the bitmap walk interact
    - 1: template 5.2, values = 17·byte + 3 (wide group references),
         group size 7 — 64 % 7 ≠ 0 exercises the true-last-length and
         nonzero scaled-group-length paths
    - 2: template 5.3 first-order spatial differencing, group size 8
    - 3: template 5.3 SECOND-order differencing with reference 50 and
         binary scale −1: decoded field = 50 + (byte>>1)·0.5 — exact
         halves, order-independent sums

    ``la1 = (msg_id % 121) − 60`` again covers both hemispheres."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.text import _spread

    def _synth(batches):
        import numpy as np

        def grib(text: str, msg_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            cells = bts[np.arange(64) % len(bts)]
            la1 = float((msg_id % 121) - 60)
            c = msg_id % 4
            if c == 0:
                bm = np.zeros(64, bool)
                bm[::2] = True
                return build_grib2(cells[::2], bitmap=bm.reshape(8, 8),
                                   complex_packed=True, group_size=5,
                                   la1=la1)
            if c == 1:
                return build_grib2((cells * 17 + 3).reshape(8, 8),
                                   complex_packed=True, group_size=7,
                                   la1=la1)
            if c == 2:
                return build_grib2(cells.reshape(8, 8),
                                   complex_packed=True,
                                   spatial_diff_order=1, group_size=8,
                                   la1=la1)
            return build_grib2((cells >> 1).reshape(8, 8), ref=50.0,
                               binary_scale=-1, complex_packed=True,
                               spatial_diff_order=2, group_size=6,
                               la1=la1)

        for pdf in batches:
            ids = pdf.iloc[:, 0].astype("int64")
            payloads = [grib(t, i) for t, i in
                        zip(pdf.iloc[:, 1].fillna(""), ids)]
            yield pd.DataFrame({"msg_id": ids, "payload": payloads})

    return (_spread(df).select(F.col(id_col), F.col(text_col))
            .mapInPandas(_synth, schema="msg_id long, payload binary"))


def grib2_long(payload_df, id_col: str = "msg_id",
               payload_col: str = "payload"):
    """Decode GRIB2 payloads into the long climate-table shape — one
    row per PRESENT grid cell (bitmap-masked cells are absent, the
    same contract as a real ingest), decoded inside one Arrow
    ``mapInPandas`` so payload bytes never leave the executor."""
    import pandas as pd

    def _decode(batches):
        import numpy as np

        lon_cache: dict = {}

        def _par_lons(k: int) -> np.ndarray:
            got = lon_cache.get(k)
            if got is None:
                got = lon_cache[k] = np.arange(k) * (360.0 / k)
            return got

        for pdf in batches:
            rows = {k: [] for k in ("msg_id", "template", "ref_time",
                                    "param_category", "param_number",
                                    "lat", "lon", "value")}
            for mid, payload in zip(pdf[id_col].astype("int64"),
                                    pdf[payload_col]):
                for m in parse_grib2(bytes(payload)):
                    if m.get("spectral"):
                        raise ValueError(
                            "grib2_long got a spherical-harmonic "
                            "field — use grib2_spectral_long")
                    vals = m["values"]
                    if m.get("pl") is not None:
                        # reduced Gaussian: ragged parallels — each
                        # parallel j holds pl[j] points at spacing
                        # 360/pl[j] from lo1
                        pl = m["pl"]
                        latf = np.repeat(m["lats"], pl)
                        lonf = m["lo1"] + np.concatenate(
                            [_par_lons(int(k)) for k in pl])
                    elif m.get("lat2d") is not None:
                        # Lambert conformal: lat/lon are genuinely 2-D
                        # fields, one value per stored cell
                        latf = m["lat2d"].reshape(-1)
                        lonf = m["lon2d"].reshape(-1)
                        vals = vals.reshape(-1)
                    else:
                        nj, ni = vals.shape
                        # the parser computes the north-first latitude
                        # vector per grid template (regular spacing
                        # for 3.0, quadrature nodes for 3.40 Gaussian)
                        lat = m["lats"]
                        lon = m["lo1"] + m["dlon"] * np.arange(ni)
                        latg, long_ = np.meshgrid(lat, lon,
                                                  indexing="ij")
                        latf = latg.reshape(-1)
                        lonf = long_.reshape(-1)
                        vals = vals.reshape(-1)
                    mask = ~np.isnan(vals)
                    n = int(mask.sum())
                    rows["msg_id"].extend([int(mid)] * n)
                    rows["template"].extend([m["template"]] * n)
                    rows["ref_time"].extend([m["ref_time"]] * n)
                    rows["param_category"].extend(
                        [m["param_category"]] * n)
                    rows["param_number"].extend([m["param_number"]] * n)
                    rows["lat"].extend(latf[mask].tolist())
                    rows["lon"].extend(lonf[mask].tolist())
                    rows["value"].extend(vals[mask].tolist())
            yield pd.DataFrame(rows)

    return payload_df.mapInPandas(_decode, schema=GRIB_LONG_SCHEMA)


def read_grib2_long(spark, path_glob: str):
    """Distributed GRIB2 file ingest: ``binaryFile`` ships each file's
    bytes to an executor, ``grib2_long`` decodes every message there —
    the netcdf3/hdf5 multi-file pattern applied to the WMO format."""
    from pyspark.sql import functions as F

    files = (spark.read.format("binaryFile").load(path_glob)
             .select(F.monotonically_increasing_id().alias("msg_id"),
                     F.col("content").alias("payload")))
    return grib2_long(files)


def synthesize_grib2_interval(df, id_col: str, text_col: str):
    """Build REAL template-4.8 GRIB2 messages (statistics over a time
    interval — the accumulation/max products operational archives
    actually publish) deterministically from text rows: statistical
    process = ``msg_id % 4`` (avg/accum/max/min), interval length
    ``1 + msg_id % 96`` hours, interval end walking a calendar from
    the id; three residue classes of ``msg_id % 3`` pick the data
    representation (8-bit simple / complex 5.2 / 7-bit halves with
    reference 100)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.text import _spread

    def _synth(batches):
        import numpy as np

        def grib(text: str, msg_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            cells = bts[np.arange(64) % len(bts)]
            stat = (msg_id % 4, 1 + msg_id % 96,
                    (2021, 1 + msg_id % 12, 1 + msg_id % 28,
                     msg_id % 24, 0, 0))
            c = msg_id % 3
            if c == 0:
                return build_grib2(cells.reshape(8, 8), nbits=8,
                                   stat=stat)
            if c == 1:
                return build_grib2(cells.reshape(8, 8),
                                   complex_packed=True, group_size=6,
                                   stat=stat)
            return build_grib2((cells >> 1).reshape(8, 8), ref=100.0,
                               binary_scale=-1, nbits=7, stat=stat)

        for pdf in batches:
            ids = pdf.iloc[:, 0].astype("int64")
            payloads = [grib(t, i) for t, i in
                        zip(pdf.iloc[:, 1].fillna(""), ids)]
            yield pd.DataFrame({"msg_id": ids, "payload": payloads})

    return (_spread(df).select(F.col(id_col), F.col(text_col))
            .mapInPandas(_synth, schema="msg_id long, payload binary"))


def grib2_interval_stats(payload_df, id_col: str = "msg_id",
                         payload_col: str = "payload"):
    """Decode template-4.8 GRIB2 payloads executor-side → one row per
    message with the statistical-interval metadata and the field mean:
    (msg_id, stat_process, stat_hours, interval_end, mean_value)."""
    import pandas as pd

    def _decode(batches):
        import numpy as np

        for pdf in batches:
            rows = {"msg_id": [], "stat_process": [], "stat_hours": [],
                    "interval_end": [], "mean_value": []}
            for mid, payload in zip(pdf[id_col].astype("int64"),
                                    pdf[payload_col]):
                for m in parse_grib2(bytes(payload)):
                    rows["msg_id"].append(int(mid))
                    rows["stat_process"].append(int(m["stat_process"]))
                    rows["stat_hours"].append(int(m["stat_hours"]))
                    rows["interval_end"].append(m["interval_end"])
                    rows["mean_value"].append(
                        float(np.nanmean(m["values"])))
            yield pd.DataFrame(rows)

    return payload_df.mapInPandas(
        _decode, schema=("msg_id long, stat_process int, "
                         "stat_hours int, interval_end string, "
                         "mean_value double"))


def synthesize_grib2_reduced(df, id_col: str, text_col: str):
    """Build REAL reduced-Gaussian-grid GRIB2 messages (template 3.40
    with Ni missing + the per-parallel point-count list) from text
    rows: 8 parallels (N = 4) with profile ``pl[j] = 4 + (msg_id+j)%5``
    and values = text bytes cycled over the sum(pl)-point stream;
    even ids pack simple 8-bit, odd ids complex 5.3 order 1 — the
    packing must be transparent to the decoded field."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.text import _spread

    def _synth(batches):
        import numpy as np

        def grib(text: str, msg_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            pl = np.array([4 + (msg_id + j) % 5 for j in range(8)],
                          np.int64)
            n = int(pl.sum())
            flat = bts[np.arange(n) % len(bts)]
            if msg_id % 2:
                return build_grib2(flat, gaussian=True, reduced_pl=pl,
                                   lo1=0.0, complex_packed=True,
                                   spatial_diff_order=1, group_size=6)
            return build_grib2(flat, gaussian=True, reduced_pl=pl,
                               lo1=0.0, nbits=8)

        for pdf in batches:
            ids = pdf.iloc[:, 0].astype("int64")
            payloads = [grib(t, i) for t, i in
                        zip(pdf.iloc[:, 1].fillna(""), ids)]
            yield pd.DataFrame({"msg_id": ids, "payload": payloads})

    return (_spread(df).select(F.col(id_col), F.col(text_col))
            .mapInPandas(_synth, schema="msg_id long, payload binary"))


def synthesize_grib2_missing(df, id_col: str, text_col: str):
    """Build REAL GRIB2 messages with template-5.2/5.3 MISSING-VALUE
    MANAGEMENT (octet 23 = 1/2 — the no-bitmap sentinel encoding
    accumulation products publish) deterministically from text rows.
    Cell i is primary-missing when ``(byte_i + i) % 7 == 0`` and (for
    management-2 classes) secondary-missing when ``(byte_i + i) % 11
    == 0`` — always 48+ of the 64 cells survive. Four residue classes
    of ``msg_id % 4``:

    - 0: template 5.2, management 1, group size 5
    - 1: template 5.2, management 2 (primary + secondary), values
         17·byte + 3, group size 7
    - 2: template 5.3 first-order differencing, management 1
    - 3: template 5.3 SECOND-order differencing, management 2,
         reference 50 + binary scale −1 (exact halves)"""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.text import _spread

    def _synth(batches):
        import numpy as np

        def grib(text: str, msg_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            cells = bts[np.arange(64) % len(bts)]
            idx = np.arange(64)
            mp = (cells + idx) % 7 == 0
            ms = ((cells + idx) % 11 == 0) & ~mp
            c = msg_id % 4
            if c == 0:
                return build_grib2(cells.reshape(8, 8),
                                   complex_packed=True, group_size=5,
                                   missing_primary=mp.reshape(8, 8))
            if c == 1:
                return build_grib2((cells * 17 + 3).reshape(8, 8),
                                   complex_packed=True, group_size=7,
                                   missing_primary=mp.reshape(8, 8),
                                   missing_secondary=ms.reshape(8, 8))
            if c == 2:
                return build_grib2(cells.reshape(8, 8),
                                   complex_packed=True,
                                   spatial_diff_order=1, group_size=8,
                                   missing_primary=mp.reshape(8, 8))
            return build_grib2((cells >> 1).reshape(8, 8), ref=50.0,
                               binary_scale=-1, complex_packed=True,
                               spatial_diff_order=2, group_size=6,
                               missing_primary=mp.reshape(8, 8),
                               missing_secondary=ms.reshape(8, 8))

        for pdf in batches:
            ids = pdf.iloc[:, 0].astype("int64")
            payloads = [grib(t, i) for t, i in
                        zip(pdf.iloc[:, 1].fillna(""), ids)]
            yield pd.DataFrame({"msg_id": ids, "payload": payloads})

    return (_spread(df).select(F.col(id_col), F.col(text_col))
            .mapInPandas(_synth, schema="msg_id long, payload binary"))


def synthesize_grib2_lambert(df, id_col: str, text_col: str):
    """Build REAL Lambert-conformal (grid template 3.30) GRIB2
    messages deterministically from text rows — the HRRR/NAM regional
    layout: 8×8 grids anchored at integer-degree (la1, lo1) with
    integer-metre spacing (all exact in the microdegree/millimetre
    wire fields), cone parameters from the id. Three residue classes
    of ``msg_id % 3``:

    - 0: TANGENT cone (latin1 == latin2 → n = sin latin1),
         8-bit simple packing
    - 1: secant cone (latin2 = latin1 + 15), complex 5.2
    - 2: secant cone, complex 5.3 order 2, reference 50 + binary
         scale −1 (exact halves)"""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.text import _spread

    def _synth(batches):
        import numpy as np

        def grib(text: str, msg_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            cells = bts[np.arange(64) % len(bts)]
            c = msg_id % 3
            latin1 = float(25 + msg_id % 10)
            lam = dict(lad=latin1, lov=float(250 + msg_id % 20),
                       latin1=latin1,
                       latin2=latin1 if c == 0 else latin1 + 15.0,
                       dx=3000.0 * (1 + msg_id % 3),
                       dy=3000.0 * (1 + msg_id % 3))
            la1 = float(18 + msg_id % 12)
            lo1 = lam["lov"] - 6.0 + float(msg_id % 13)
            if c == 0:
                return build_grib2(cells.reshape(8, 8), nbits=8,
                                   la1=la1, lo1=lo1, lambert=lam)
            if c == 1:
                return build_grib2(cells.reshape(8, 8),
                                   complex_packed=True, group_size=5,
                                   la1=la1, lo1=lo1, lambert=lam)
            return build_grib2((cells >> 1).reshape(8, 8), ref=50.0,
                               binary_scale=-1, complex_packed=True,
                               spatial_diff_order=2, group_size=6,
                               la1=la1, lo1=lo1, lambert=lam)

        for pdf in batches:
            ids = pdf.iloc[:, 0].astype("int64")
            payloads = [grib(t, i) for t, i in
                        zip(pdf.iloc[:, 1].fillna(""), ids)]
            yield pd.DataFrame({"msg_id": ids, "payload": payloads})

    return (_spread(df).select(F.col(id_col), F.col(text_col))
            .mapInPandas(_synth, schema="msg_id long, payload binary"))


def synthesize_grib2_jpeg2000(df, id_col: str, text_col: str):
    """Build REAL JPEG2000-packed GRIB2 messages (data representation
    template 5.40 — newer ECMWF disseminations and NCEP archives)
    deterministically from text rows; the payload wraps a genuine
    lossless J2K codestream from ``sources/j2k.py`` (MQ coder, EBCOT,
    reversible 5/3). Four residue classes of ``msg_id % 4``:

    - 0: 8-bit values = bytes, full 8×8 grid (2-D wavelet path)
    - 1: 12-bit values = 16·byte + 7
    - 2: BITMAP with even cells present — masked fields ride as a
         (1, n_data) image, the g2clib layout
    - 3: 7-bit with reference 100 and binary scale −1 (exact halves)"""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.text import _spread

    def _synth(batches):
        import numpy as np

        def grib(text: str, msg_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            cells = bts[np.arange(64) % len(bts)]
            la1 = float((msg_id % 121) - 60)
            c = msg_id % 4
            if c == 0:
                return build_grib2(cells.reshape(8, 8), nbits=8,
                                   jpeg2000_packed=True, la1=la1)
            if c == 1:
                return build_grib2((cells * 16 + 7).reshape(8, 8),
                                   nbits=12, jpeg2000_packed=True,
                                   la1=la1)
            if c == 2:
                bm = np.zeros(64, bool)
                bm[::2] = True
                return build_grib2(cells[::2], nbits=8,
                                   bitmap=bm.reshape(8, 8),
                                   jpeg2000_packed=True, la1=la1)
            return build_grib2((cells >> 1).reshape(8, 8), ref=100.0,
                               binary_scale=-1, nbits=7,
                               jpeg2000_packed=True, la1=la1)

        for pdf in batches:
            ids = pdf.iloc[:, 0].astype("int64")
            payloads = [grib(t, i) for t, i in
                        zip(pdf.iloc[:, 1].fillna(""), ids)]
            yield pd.DataFrame({"msg_id": ids, "payload": payloads})

    return (_spread(df).select(F.col(id_col), F.col(text_col))
            .mapInPandas(_synth, schema="msg_id long, payload binary"))


def synthesize_grib2_aec(df, id_col: str, text_col: str):
    """Build REAL CCSDS/AEC-packed GRIB2 messages (data representation
    template 5.42 — the libaec packing newer ECMWF/EUMETSAT streams
    carry) deterministically from text rows; payloads are genuine
    CCSDS 121.0-B-2 streams from ``sources/szip.py`` with the AEC
    framing. Four residue classes of ``msg_id % 4``:

    - 0: block 16 / RSI 8, 8-bit values = bytes
    - 1: block 32 / RSI 4, 12-bit values = 16·byte + 3
    - 2: block 64 / RSI 2 with AEC_PAD_RSI (the B-2-only block size
         and the per-interval byte alignment)
    - 3: block 8 / RSI 16, 7-bit with reference 100 and binary scale
         −1 (exact halves)"""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.text import _spread

    def _synth(batches):
        import numpy as np

        def grib(text: str, msg_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            cells = bts[np.arange(64) % len(bts)]
            la1 = float((msg_id % 121) - 60)
            c = msg_id % 4
            if c == 0:
                return build_grib2(cells.reshape(8, 8), nbits=8,
                                   aec_packed=True, la1=la1)
            if c == 1:
                return build_grib2((cells * 16 + 3).reshape(8, 8),
                                   nbits=12, aec_packed=True,
                                   aec_block=32, aec_rsi=4, la1=la1)
            if c == 2:
                return build_grib2(cells.reshape(8, 8), nbits=8,
                                   aec_packed=True, aec_block=64,
                                   aec_rsi=2, aec_pad_rsi=True,
                                   la1=la1)
            return build_grib2((cells >> 1).reshape(8, 8), ref=100.0,
                               binary_scale=-1, nbits=7,
                               aec_packed=True, aec_block=8,
                               aec_rsi=16, la1=la1)

        for pdf in batches:
            ids = pdf.iloc[:, 0].astype("int64")
            payloads = [grib(t, i) for t, i in
                        zip(pdf.iloc[:, 1].fillna(""), ids)]
            yield pd.DataFrame({"msg_id": ids, "payload": payloads})

    return (_spread(df).select(F.col(id_col), F.col(text_col))
            .mapInPandas(_synth, schema="msg_id long, payload binary"))


def build_grib2_spectral(x: np.ndarray, j: int, ref: float = 0.0,
                         binary_scale: int = 0, decimal_scale: int = 0,
                         nbits: int = 8,
                         laplacian_p: float | None = None,
                         subset_trunc: int = 0,
                         ref_time: tuple = (2020, 1, 1, 0, 0, 0),
                         param: tuple = (0, 0),
                         discipline: int = 0) -> bytes:
    """Assemble a spherical-harmonic GRIB2 message (grid template
    3.50, triangular truncation J=K=M=``j``): ``x`` is the packed
    integer sequence over the ECMWF coefficient order (m=0..J,
    n=m..J, real/imag), stored field = ``(R + X·2^E)/10^D``. With
    ``laplacian_p`` (data template 5.51) the sub-truncation
    ``m,n ≤ subset_trunc`` is stored as IEEE 32-bit floats of its
    Y values and every packed coefficient decodes to
    ``Y · (n(n+1))^(−p)``; without it template 5.50 simple packing."""
    x = np.asarray(x, np.int64)
    mlist, nlist, _part = _spectral_mn(j, j)
    if x.size != mlist.size:
        raise ValueError(f"spectral J={j} wants {mlist.size} values, "
                         f"got {x.size}")
    y, mo, dd, hh, mi, ss = ref_time
    s1 = (struct.pack(">HHBBB", 0, 0, 2, 1, 1)
          + struct.pack(">HBBBBB", y, mo, dd, hh, mi, ss)
          + bytes([0, 1]))
    g = (bytes([0]) + struct.pack(">I", int(x.size)) + bytes([0, 0])
         + struct.pack(">H", 50)
         + struct.pack(">III", j, j, j)
         + bytes([1, 1]))                # Legendre, complex-pack mode
    s4 = (struct.pack(">H", 0) + struct.pack(">H", 0)
          + bytes([param[0], param[1], 0, 0, 0]) + struct.pack(">H", 0)
          + bytes([0, 1]) + struct.pack(">I", 0)
          + bytes([1, 0]) + struct.pack(">I", 0)
          + bytes([255, 0]) + struct.pack(">I", 0))
    yvals = (ref + x.astype(np.float64)
             * (2.0 ** binary_scale)) / (10.0 ** decimal_scale)
    if laplacian_p is None:
        packed = _pack_bits(x, nbits)
        s5 = (struct.pack(">I", int(x.size)) + struct.pack(">H", 50)
              + struct.pack(">f", ref)
              + struct.pack(">H", _sm_enc(binary_scale, 16))
              + struct.pack(">H", _sm_enc(decimal_scale, 16))
              + bytes([nbits, 0]))
    else:
        subset = (mlist <= subset_trunc) & (nlist <= subset_trunc)
        ts = int(subset.sum())
        if (nlist[~subset] == 0).any():
            raise ValueError("Laplacian scaling over an n=0 "
                             "coefficient — widen the sub-truncation")
        floats = yvals[subset].astype(">f4").tobytes()
        packed = floats + _pack_bits(x[~subset], nbits)
        s5 = (struct.pack(">I", int(x.size)) + struct.pack(">H", 51)
              + struct.pack(">f", ref)
              + struct.pack(">H", _sm_enc(binary_scale, 16))
              + struct.pack(">H", _sm_enc(decimal_scale, 16))
              + bytes([nbits])
              + struct.pack(">I", _sm_enc(round(laplacian_p * 1e6),
                                          32))
              + struct.pack(">HHH", subset_trunc, subset_trunc,
                            subset_trunc)
              + struct.pack(">I", ts)
              + bytes([1]))               # IEEE 32-bit subset
    s6 = bytes([255])
    body = (_section(1, s1) + _section(3, g) + _section(4, s4)
            + _section(5, s5) + _section(6, s6) + _section(7, packed))
    total = 16 + len(body) + 4
    head = (b"GRIB" + bytes([0, 0, discipline, 2])
            + struct.pack(">Q", total))
    return head + body + b"7777"


def grib2_spectral_long(payload_df, id_col: str = "msg_id",
                        payload_col: str = "payload"):
    """Decode spherical-harmonic GRIB2 payloads executor-side → one
    row per COEFFICIENT VALUE: (msg_id, template, m, n, part, coeff)
    with part 0 = real, 1 = imaginary — the coefficient-domain twin of
    ``grib2_long`` (spectral fields have no lat/lon grid until a
    Legendre synthesis, which is a separate transform, not ingest)."""
    import pandas as pd

    def _decode(batches):
        for pdf in batches:
            rows = {"msg_id": [], "template": [], "m": [], "n": [],
                    "part": [], "coeff": []}
            for mid, payload in zip(pdf[id_col].astype("int64"),
                                    pdf[payload_col]):
                for rec in parse_grib2(bytes(payload)):
                    if not rec.get("spectral"):
                        raise ValueError("grib2_spectral_long got a "
                                         "grid-point field")
                    k = rec["values"].size
                    rows["msg_id"].extend([int(mid)] * k)
                    rows["template"].extend([rec["template"]] * k)
                    rows["m"].extend(rec["coeff_m"].tolist())
                    rows["n"].extend(rec["coeff_n"].tolist())
                    rows["part"].extend(rec["coeff_part"].tolist())
                    rows["coeff"].extend(rec["values"].tolist())
            yield pd.DataFrame(rows)

    return payload_df.mapInPandas(
        _decode, schema=("msg_id long, template string, m int, n int, "
                         "part int, coeff double"))


def synthesize_grib2_spectral(df, id_col: str, text_col: str):
    """Build REAL spherical-harmonic GRIB2 messages (grid template
    3.50, T7 triangular truncation → 72 coefficient values) from text
    rows — ECMWF's model-level archive shape. Three residue classes of
    ``msg_id % 3``:

    - 0: template 5.50 simple packing, X = bytes
    - 1: template 5.51, Laplacian p = 1, sub-truncation 2 (12 IEEE
         floats), reference 100 + binary scale −1 (exact halves;
         packed coefficients decode to Y / (n(n+1)))
    - 2: template 5.51, p = 2, sub-truncation 3, 12-bit X = 16·b + 5"""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.text import _spread

    def _synth(batches):
        import numpy as np

        def grib(text: str, msg_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            cells = bts[np.arange(72) % len(bts)]
            c = msg_id % 3
            if c == 0:
                return build_grib2_spectral(cells, 7, nbits=8)
            if c == 1:
                return build_grib2_spectral(cells, 7, ref=100.0,
                                            binary_scale=-1, nbits=8,
                                            laplacian_p=1.0,
                                            subset_trunc=2)
            return build_grib2_spectral(cells * 16 + 5, 7, nbits=12,
                                        laplacian_p=2.0,
                                        subset_trunc=3)

        for pdf in batches:
            ids = pdf.iloc[:, 0].astype("int64")
            payloads = [grib(t, i) for t, i in
                        zip(pdf.iloc[:, 1].fillna(""), ids)]
            yield pd.DataFrame({"msg_id": ids, "payload": payloads})

    return (_spread(df).select(F.col(id_col), F.col(text_col))
            .mapInPandas(_synth, schema="msg_id long, payload binary"))


def synthesize_grib2_spaceview(df, id_col: str, text_col: str):
    """Build REAL space-view GRIB2 messages (grid template 3.90 —
    EUMETSAT/GOES full-disk geostationary products) from text rows:
    8×8 grids straddling the limb so on-disk counts, off-disk masking
    and the perspective inverse all engage. Three residue classes of
    ``msg_id % 3`` with FIXED geometries (limb margins are orders of
    magnitude above float noise, so the on-disk set is robustly
    reproducible):

    - 0: sub-satellite 0°E, disk spans 6 of 8 grids (32 on-disk),
         8-bit simple packing
    - 1: 140°E, disk 5 grids (21 on-disk), complex 5.2
    - 2: 255°E, disk 7 grids (37 on-disk), 7-bit with reference 100 +
         binary scale −1 (exact halves)"""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.text import _spread

    def _synth(batches):
        import numpy as np

        def grib(text: str, msg_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            cells = bts[np.arange(64) % len(bts)]
            c = msg_id % 3
            if c == 0:
                sv = dict(lop=0.0, dx=6, dy=6, xp=3.5, yp=3.5,
                          nr=6610710)
                return build_grib2(cells.reshape(8, 8), nbits=8,
                                   spaceview=sv)
            if c == 1:
                sv = dict(lop=140.0, dx=5, dy=5, xp=3.0, yp=3.0,
                          nr=6610710)
                return build_grib2(cells.reshape(8, 8),
                                   complex_packed=True, group_size=5,
                                   spaceview=sv)
            sv = dict(lop=255.0, dx=7, dy=7, xp=4.0, yp=4.0,
                      nr=6610710)
            return build_grib2((cells >> 1).reshape(8, 8), ref=100.0,
                               binary_scale=-1, nbits=7, spaceview=sv)

        for pdf in batches:
            ids = pdf.iloc[:, 0].astype("int64")
            payloads = [grib(t, i) for t, i in
                        zip(pdf.iloc[:, 1].fillna(""), ids)]
            yield pd.DataFrame({"msg_id": ids, "payload": payloads})

    return (_spread(df).select(F.col(id_col), F.col(text_col))
            .mapInPandas(_synth, schema="msg_id long, payload binary"))


def build_grib2_multifield(messages: list[bytes],
                           reuse_bitmap: bool = False) -> bytes:
    """Fuse single-field messages (from ``build_grib2``) into ONE
    multi-field GRIB2 envelope: the first message contributes sections
    1 and 3, every message its sections 4-7 (all must share identical
    section-1/3 bytes — the repeated-section inheritance contract).
    ``reuse_bitmap`` replaces any later section 6 that is byte-equal
    to the last explicit bitmap with the indicator-254
    'previously defined bitmap applies' stub."""
    def split(msg: bytes) -> dict[int, bytes]:
        p, out = 16, {}
        while p < len(msg) - 4:
            (slen,) = struct.unpack_from(">I", msg, p)
            out[msg[p + 4]] = msg[p:p + slen]
            p += slen
        return out

    if not messages:
        raise ValueError("no messages to fuse")
    parts = [split(m) for m in messages]
    for q in parts[1:]:
        if q[1] != parts[0][1] or q[3] != parts[0][3]:
            raise ValueError("multi-field fusion wants identical "
                             "section 1 and section 3 across fields")
    body = parts[0][1] + parts[0][3]
    last_explicit_s6 = None
    for q in parts:
        s6 = q[6]
        if reuse_bitmap and s6[5] == 0:
            if s6 == last_explicit_s6:
                s6 = _section(6, bytes([254]))
            else:
                last_explicit_s6 = q[6]
        body += q[4] + q[5] + s6 + q[7]
    total = 16 + len(body) + 4
    head = messages[0][:8] + struct.pack(">Q", total)
    return head + body + b"7777"
