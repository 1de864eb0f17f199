"""Minimal netCDF-style grouped-array IO on HDF5.

The reference pipeline communicates through netCDF files with groups
``constant_data`` / ``observations`` / ``predictions`` /
``posterior_predictive`` (``/root/reference/covid19uk/data/assemble.py:15-16``
and ``posterior/*``).  netCDF4 is an HDF5 profile, and this environment has
h5py but not netCDF4/xarray, so we implement the thin slice we need directly:
named variables + named coordinate arrays + attrs per group.  Files written
here are plain HDF5 readable anywhere; files written by the reference
(netCDF4) are readable by :func:`load_group` because variables are plain
HDF5 datasets.
"""

from dataclasses import dataclass, field
from typing import Dict, Tuple

import h5py
import numpy as np

_COORD_PREFIX = "_coord_"


@dataclass
class Group:
    """An in-memory grouped dataset: variables + coords + attrs."""

    variables: Dict[str, np.ndarray] = field(default_factory=dict)
    dims: Dict[str, Tuple[str, ...]] = field(default_factory=dict)
    coords: Dict[str, np.ndarray] = field(default_factory=dict)
    attrs: Dict[str, object] = field(default_factory=dict)

    def __getitem__(self, name):
        return self.variables[name]

    def __contains__(self, name):
        return name in self.variables


def _encode(arr):
    arr = np.asarray(arr)
    if arr.dtype.kind == "M":  # datetime64 -> ISO strings
        return np.asarray(arr.astype("datetime64[D]").astype(str), dtype="S")
    if arr.dtype.kind == "U":
        return arr.astype("S")
    return arr


def _decode(arr):
    arr = np.asarray(arr)
    if arr.dtype.kind == "S" or arr.dtype == object:
        out = arr.astype(str)
        try:
            return out.astype("datetime64[D]")
        except ValueError:
            return out
    return arr


def save_group(path, group_name, group: Group, mode="a"):
    """Writes a Group to ``path`` under HDF5 group ``group_name``."""
    with h5py.File(path, mode) as f:
        if group_name in f:
            del f[group_name]
        g = f.create_group(group_name)
        for k, v in group.attrs.items():
            g.attrs[k] = v
        for name, arr in group.variables.items():
            d = g.create_dataset(name, data=_encode(arr))
            if name in group.dims:
                d.attrs["dims"] = ",".join(group.dims[name])
        for name, arr in group.coords.items():
            g.create_dataset(_COORD_PREFIX + name, data=_encode(arr))


def load_group(path, group_name) -> Group:
    """Reads a Group.  Tolerates plain netCDF4-written files: any dataset
    not using our coord prefix is treated as a variable; scalar/1-D
    variables that share a name with a netCDF dimension become coords."""
    out = Group()
    with h5py.File(path, "r") as f:
        g = f[group_name]
        out.attrs = dict(g.attrs)
        for name, item in g.items():
            if not isinstance(item, h5py.Dataset):
                continue
            data = _decode(item[()])
            if name.startswith(_COORD_PREFIX):
                out.coords[name[len(_COORD_PREFIX) :]] = data
            else:
                out.variables[name] = data
                if "dims" in item.attrs:
                    dims_attr = item.attrs["dims"]
                    if isinstance(dims_attr, bytes):
                        dims_attr = dims_attr.decode()
                    out.dims[name] = tuple(dims_attr.split(","))
    return out


def copy_attrs(src_path, dest_path):
    """Copies root attrs between files (reference ``util.py:16-22``)."""
    with h5py.File(src_path, "r") as s:
        attrs = dict(s.attrs)
    with h5py.File(dest_path, "a") as d:
        for k, v in attrs.items():
            d.attrs[k] = v
