"""Cone specification: parsing, validation, dimension accounting, row layout.

Parity notes (reference = /root/reference):
  * Accepted cone-dict keys and their types follow the reference C parser
    (scs/scsobject.h:684-794): int fields accept python ints / numpy
    integers; array fields accept int | list | 1-D numpy array; negative
    values and non-integral values are rejected.
  * The deprecated 'f' key is folded into 'z' with a DeprecationWarning
    (scsobject.h:692-704).
  * Row ordering of the concatenated slack vector matches the reference
    core: z, l, box(bu/bl), q, s, cs, ep, ed, p, then the spectral cones
    d, nuc, ell1, sl (meson.build:206-216; dims per
    test/test_spectral_and_complex_cones.py:40-51).
  * Dimension accounting mirrors test/gen_random_cone_prob.py:68-87:
      box   -> len(bu) + 1          (homogeneous (t, s) block)
      s[i]  -> n(n+1)/2             (packed real PSD triangle)
      cs[i] -> n^2                  (complex PSD, n^2 reals)
      ep/ed -> 3 per cone, p -> 3 per cone
      d[i]  -> n(n+1)/2 + 2,  nuc -> m*n + 1, ell1 -> n+1, sl -> n(n+1)/2 + 1
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import List, Optional, Tuple

import numpy as np

_INT_KEYS = ("f", "z", "l", "ep", "ed")
_INT_ARR_KEYS = ("q", "s", "cs", "d", "nuc_m", "nuc_n", "ell1", "sl_n", "sl_k")
_FLOAT_ARR_KEYS = ("bu", "bl", "p")
VALID_KEYS = set(_INT_KEYS) | set(_INT_ARR_KEYS) | set(_FLOAT_ARR_KEYS)


def _parse_nonneg_int(name, val):
    try:
        iv = int(val)
    except (TypeError, ValueError):
        raise TypeError(f"Cone field {name} must be an integer")
    if iv != val:
        raise ValueError(f"Cone field {name} must be an integral value")
    if iv < 0:
        raise ValueError(f"Cone field {name} must be nonnegative")
    return iv


def _parse_int_array(name, val):
    if val is None:
        return []
    if isinstance(val, (int, np.integer)):
        return [_parse_nonneg_int(name, val)]
    arr = np.asarray(val)
    if arr.ndim == 0:
        return [_parse_nonneg_int(name, arr[()])]
    if arr.ndim != 1:
        raise TypeError(f"Cone field {name} must be an int, list, or 1-D array")
    return [_parse_nonneg_int(name, v) for v in arr.tolist()]


def _parse_float_array(name, val):
    if val is None:
        return np.zeros(0)
    if isinstance(val, (int, float, np.integer, np.floating)):
        return np.array([float(val)])
    arr = np.asarray(val, dtype=np.float64)
    if arr.ndim == 0:
        return arr.reshape(1)
    if arr.ndim != 1:
        raise TypeError(f"Cone field {name} must be a float, list, or 1-D array")
    return arr


def sd_cone_size(n: int) -> int:
    """Packed size of an n x n real symmetric matrix (triangle)."""
    return (n * (n + 1)) // 2


@dataclasses.dataclass(frozen=True)
class Segment:
    """One contiguous block of cone rows in the slack vector."""

    kind: str  # 'z','l','box','q','s','cs','ep','ed','p','d','nuc','ell1','sl'
    offset: int
    length: int
    # kind-specific parameters:
    #   q/s/cs: matrix/cone dim; p: power; box: none (bounds stored on spec)
    #   d: matrix dim; nuc: (m, n); ell1: n; sl: (n, k)
    param: object = None


@dataclasses.dataclass(frozen=True)
class ConeSpec:
    """Validated cone specification with fixed row layout."""

    z: int
    l: int
    bu: np.ndarray  # box upper bounds, may contain +inf
    bl: np.ndarray  # box lower bounds, may contain -inf
    q: Tuple[int, ...]
    s: Tuple[int, ...]
    cs: Tuple[int, ...]
    ep: int
    ed: int
    p: Tuple[float, ...]
    d: Tuple[int, ...] = ()
    nuc: Tuple[Tuple[int, int], ...] = ()
    ell1: Tuple[int, ...] = ()
    sl: Tuple[Tuple[int, int], ...] = ()

    @property
    def bsize(self) -> int:
        return len(self.bu) + 1 if len(self.bu) > 0 else 0

    @property
    def is_simple(self) -> bool:
        """True when every cone is a clamp (zero/nonneg/box) — the regime
        where the f32 direct solve converges without iterative refinement.
        Curved cones (SOC/PSD/exp/power/spectral) amplify the KKT solve
        error and need the extra refinement pass (measured r5: the
        reference mixed-cone K runs to max_iters without it)."""
        return not (
            self.q
            or self.s
            or self.cs
            or self.ep
            or self.ed
            or self.p
            or self.d
            or self.nuc
            or self.ell1
            or self.sl
        )

    @property
    def dim(self) -> int:
        """Total number of cone rows (must equal m)."""
        return (
            self.z
            + self.l
            + self.bsize
            + sum(self.q)
            + sum(sd_cone_size(n) for n in self.s)
            + sum(n * n for n in self.cs)
            + 3 * self.ep
            + 3 * self.ed
            + 3 * len(self.p)
            + sum(sd_cone_size(n) + 2 for n in self.d)
            + sum(mm * nn + 1 for (mm, nn) in self.nuc)
            + sum(n + 1 for n in self.ell1)
            + sum(sd_cone_size(n) + 1 for (n, _k) in self.sl)
        )

    def segments(self) -> List[Segment]:
        """Ordered row segments of the slack vector."""
        segs: List[Segment] = []
        off = 0

        def add(kind, length, param=None):
            nonlocal off
            if length > 0:
                segs.append(Segment(kind, off, length, param))
            off += length

        add("z", self.z)
        add("l", self.l)
        add("box", self.bsize)
        for qi in self.q:
            add("q", qi, qi)
        for ni in self.s:
            add("s", sd_cone_size(ni), ni)
        for ni in self.cs:
            add("cs", ni * ni, ni)
        for _ in range(self.ep):
            add("ep", 3)
        for _ in range(self.ed):
            add("ed", 3)
        for pi in self.p:
            add("p", 3, pi)
        for ni in self.d:
            add("d", sd_cone_size(ni) + 2, ni)
        for (mm, nn) in self.nuc:
            add("nuc", mm * nn + 1, (mm, nn))
        for ni in self.ell1:
            add("ell1", ni + 1, ni)
        for (nn, kk) in self.sl:
            add("sl", sd_cone_size(nn) + 1, (nn, kk))
        return segs

    def zero_row_mask(self) -> np.ndarray:
        """Boolean mask over rows belonging to the zero cone.

        The reference core weights zero-cone (equality) rows more heavily in
        the diagonal DR metric; the solver uses this mask to build R_y.
        """
        mask = np.zeros(self.dim, dtype=bool)
        mask[: self.z] = True
        return mask

    @staticmethod
    def from_dict(cone: dict) -> "ConeSpec":
        if not isinstance(cone, dict):
            raise TypeError("cone must be a dict")
        unknown = set(cone.keys()) - VALID_KEYS
        if unknown:
            raise ValueError(f"Unknown cone field(s): {sorted(unknown)}")

        z = _parse_nonneg_int("z", cone.get("z", 0))
        f = _parse_nonneg_int("f", cone.get("f", 0))
        if f > 0:
            warnings.warn(
                "The 'f' cone field is deprecated; use 'z' (Zero cone) "
                "instead. If both 'f' and 'z' are set they are summed.",
                DeprecationWarning,
                stacklevel=3,
            )
            z += f
        l = _parse_nonneg_int("l", cone.get("l", 0))

        bu = _parse_float_array("bu", cone.get("bu"))
        bl = _parse_float_array("bl", cone.get("bl"))
        if len(bu) != len(bl):
            raise ValueError("bu different dimension to bl")
        if len(bu) > 0 and np.any(bu < bl):
            raise ValueError("box cone requires bl <= bu elementwise")

        q = tuple(_parse_int_array("q", cone.get("q")))
        s = tuple(_parse_int_array("s", cone.get("s")))
        cs = tuple(_parse_int_array("cs", cone.get("cs")))
        ep = _parse_nonneg_int("ep", cone.get("ep", 0))
        ed = _parse_nonneg_int("ed", cone.get("ed", 0))
        p = tuple(float(v) for v in _parse_float_array("p", cone.get("p")))
        for pi in p:
            # Power-cone parameter a = |p| must lie strictly inside (0, 1)
            # (sign selects primal vs dual, gen_random_cone_prob.py:90-130).
            # The reference C parser accepts the degenerate endpoints
            # p in {0, +-1} (scs validates only |p| <= 1) but its Newton
            # projection is undefined there; we reject them up front so a
            # degenerate parameter can never reach the projector.
            if not np.isfinite(pi) or not (0.0 < abs(pi) < 1.0):
                raise ValueError(
                    "power cone parameters must satisfy 0 < |p| < 1 "
                    f"(got {pi!r}; negative p selects the dual cone)"
                )

        d = tuple(_parse_int_array("d", cone.get("d")))
        nuc_m = _parse_int_array("nuc_m", cone.get("nuc_m"))
        nuc_n = _parse_int_array("nuc_n", cone.get("nuc_n"))
        if len(nuc_m) != len(nuc_n):
            raise ValueError("nuc_m and nuc_n must have the same length")
        for mm, nn in zip(nuc_m, nuc_n):
            if mm < nn:
                raise ValueError("nuclear-norm cone requires nuc_m >= nuc_n")
        ell1 = tuple(_parse_int_array("ell1", cone.get("ell1")))
        sl_n = _parse_int_array("sl_n", cone.get("sl_n"))
        sl_k = _parse_int_array("sl_k", cone.get("sl_k"))
        if len(sl_n) != len(sl_k):
            raise ValueError("sl_n and sl_k must have the same length")
        for nn, kk in zip(sl_n, sl_k):
            if not (0 < kk <= nn):
                raise ValueError("sum-largest cone requires 0 < sl_k <= sl_n")

        return ConeSpec(
            z=z,
            l=l,
            bu=bu,
            bl=bl,
            q=q,
            s=s,
            cs=cs,
            ep=ep,
            ed=ed,
            p=p,
            d=d,
            nuc=tuple(zip(nuc_m, nuc_n)),
            ell1=ell1,
            sl=tuple(zip(sl_n, sl_k)),
        )
