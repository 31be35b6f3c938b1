"""Host-side IO: .xyz cloud loaders, 4x4 pose loaders, file discovery.

TPU-native replacement for the reference's text IO (include/common.h):

- :func:`load_xyz` ~ ``loadXYZ`` (common.h:224-239) — 6 doubles per line,
  point + normal. The reference's read-then-check loop appends one trailing
  garbage point after EOF (SURVEY §7.4); we intentionally do NOT reproduce
  that bug.
- :func:`load_matrix4d` ~ ``loadMatrix4d`` (common.h:172-187) — up to 16
  whitespace-separated doubles, row-major, missing entries default to 0 with
  m[3,3]=1 (this is how the 3x4 dinosaur pose files parse to a valid 4x4).
- :func:`discover` ~ ``getAllTextFilesFromFolder`` (common.h:119-170) —
  prefix + {.txt,.xyz} suffix match, sorted by (length, lex) so
  ``cloudXYZ_2`` sorts before ``cloudXYZ_10``.

A C fast path for the hot .xyz parse lives in native/ (ctypes); we fall back
to numpy when the shared library is not built.
"""
from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

SUFFIXES = (".txt", ".xyz")


def _native_parser():
    try:
        from . import native

        return native.parse_floats_file if native.available() else None
    except Exception:
        return None


def load_xyz(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load an .xyz file of ``x y z nx ny nz`` rows -> (points, normals).

    Returns float64 arrays of shape (N, 3). Replicates loadXYZ
    (common.h:224-239) minus its trailing-garbage-point quirk.
    """
    parse = _native_parser()
    if parse is not None:
        data = parse(path)
    else:
        # np.fromfile with sep handles arbitrary whitespace incl. newlines.
        data = np.fromfile(path, dtype=np.float64, sep=" ")
    if data.size % 6 != 0:
        raise ValueError(
            f"{path}: expected multiple of 6 floats, got {data.size}"
        )
    data = data.reshape(-1, 6)
    return np.ascontiguousarray(data[:, :3]), np.ascontiguousarray(data[:, 3:])


def load_ply(path: str) -> np.ndarray:
    """Minimal ascii-PLY vertex loader -> (N, 3) points.

    Replicates ``loadPLY`` (common.h:189-222; present in the reference but
    unused by either main): reads ``element vertex N`` from the header and
    the first three floats of each vertex line.
    """
    with open(path, "r") as f:
        n = 0
        for line in f:
            line = line.strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            if line.startswith("end_header"):
                break
        pts = np.empty((n, 3), dtype=np.float64)
        for i in range(n):
            vals = f.readline().split()
            pts[i] = [float(v) for v in vals[:3]]
    return pts


def load_matrix4d(path: str) -> np.ndarray:
    """Load a row-major 4x4 pose matrix (loadMatrix4d, common.h:172-187)."""
    vals = np.fromfile(path, dtype=np.float64, sep=" ")
    out = np.zeros(16, dtype=np.float64)
    out[15] = 1.0
    n = min(vals.size, 16)
    out[:n] = vals[:n]
    return out.reshape(4, 4)


def discover(dir_path: str, prefix: str,
             suffixes: Tuple[str, ...] = SUFFIXES) -> List[str]:
    """Find files matching prefix*{suffixes}, sorted by (length, lex).

    Replicates getAllFilesFromFolder's ordering (common.h:149-155): shorter
    names first, then lexicographic — the numeric-suffix ordering the sample
    datasets rely on. A leading ``*`` in prefix means "contains" like the
    reference (common.h:77-82).
    """
    try:
        entries = os.listdir(dir_path)
    except OSError:
        return []
    contains = prefix.startswith("*")
    needle = prefix[1:] if contains else prefix
    out = []
    for name in entries:
        if not name.endswith(suffixes):
            continue
        ok = (needle in name) if contains else name.startswith(needle)
        if ok:
            out.append(os.path.join(dir_path, name))
    out.sort(key=lambda p: (len(os.path.basename(p)), os.path.basename(p)))
    return out
