"""Clean-room netCDF-4 on-HDF5 profile validator.

This environment has neither netCDF4-c nor h5netcdf nor xarray and no
network egress, so a live round-trip against the reference's readers
(VERDICT r03 item 5) cannot be executed here.  This module is the
strongest substitute: an INDEPENDENT validator of the documented netCDF-4
enhanced-format invariants, written against the public format spec
(Unidata "NetCDF-4 enhanced file format" + the HDF5 Dimension Scales spec,
H5DS) and NOT against covid19uk_tpu's writer — it reads raw h5py
attributes/references only, no covid19uk_tpu imports — so it cannot
inherit a writer bug.

Checked invariants (per group):

  D1. Every dataset whose CLASS attribute is ``DIMENSION_SCALE`` is
      one-dimensional and carries a NAME attribute that is either the
      dataset's own name (coordinate variable) or netCDF-c's phony-dim
      marker ``"This is a netCDF dimension but not a netCDF variable. N"``
      with N == the scale's length.
  D2. Dimension scales carry unique ``_Netcdf4Dimid`` int attributes
      (netcdf-c's dimension ordering bookkeeping).
  V1. Every non-scale dataset has a ``DIMENSION_LIST`` attribute with one
      entry per axis; every entry dereferences to a DIMENSION_SCALE
      dataset in the file whose length equals that axis' extent.
  V2. Each attached scale's ``REFERENCE_LIST`` attribute (H5DS spec) holds
      a (dataset-ref, axis) pair pointing back at the variable — the
      back-pointer netCDF4-c maintains and h5netcdf checks.
  R1. The file root carries ``_NCProperties`` (the netcdf-c provenance
      stamp; readers use it for format sniffing).

Usage:
    python tools/nc4_validate.py file.nc [file2.nc ...]

Exit code 0 = all files pass; a report is printed per group.
"""

import sys

import h5py
import numpy as np

_PHONY = "This is a netCDF dimension but not a netCDF variable."


def _decode(v):
    return v.decode() if isinstance(v, bytes) else str(v)


def validate_group(f, group, errors, prefix=""):
    """Appends human-readable violation strings to ``errors``."""
    scales = {}
    for name, item in group.items():
        if not isinstance(item, h5py.Dataset):
            continue
        cls = item.attrs.get("CLASS")
        if cls is not None and _decode(cls) == "DIMENSION_SCALE":
            scales[name] = item
            # D1: 1-D with a conformant NAME
            if item.ndim != 1:
                errors.append(f"{prefix}{name}: scale is {item.ndim}-D")
            nm = item.attrs.get("NAME")
            if nm is None:
                errors.append(f"{prefix}{name}: scale missing NAME")
            else:
                nm = _decode(nm)
                if nm.startswith(_PHONY):
                    tail = nm[len(_PHONY):].strip()
                    if tail and int(tail) != item.shape[0]:
                        errors.append(
                            f"{prefix}{name}: phony NAME length {tail} != "
                            f"extent {item.shape[0]}"
                        )
                elif nm != name:
                    errors.append(
                        f"{prefix}{name}: NAME {nm!r} is neither the "
                        "dataset name nor the phony marker"
                    )

    # D2: unique dimids
    dimids = {}
    for name, s in scales.items():
        did = s.attrs.get("_Netcdf4Dimid")
        if did is None:
            errors.append(f"{prefix}{name}: scale missing _Netcdf4Dimid")
            continue
        did = int(np.asarray(did))
        if did in dimids:
            errors.append(
                f"{prefix}{name}: _Netcdf4Dimid {did} duplicates "
                f"{dimids[did]}"
            )
        dimids[did] = name

    scale_ids = {s.id: n for n, s in scales.items()}

    for name, item in group.items():
        if not isinstance(item, h5py.Dataset) or name in scales:
            continue
        dl = item.attrs.get("DIMENSION_LIST")
        if dl is None:
            errors.append(f"{prefix}{name}: variable missing DIMENSION_LIST")
            continue
        if len(dl) != item.ndim:
            errors.append(
                f"{prefix}{name}: DIMENSION_LIST has {len(dl)} entries for "
                f"a {item.ndim}-D variable"
            )
            continue
        for axis, refs in enumerate(dl):
            if len(refs) == 0:
                errors.append(f"{prefix}{name}: axis {axis} has no scale")
                continue
            target = f[refs[0]]
            # V1: the reference dereferences to a scale of matching length
            if target.id not in scale_ids:
                errors.append(
                    f"{prefix}{name}: axis {axis} references a non-scale "
                    f"dataset {target.name}"
                )
                continue
            if target.shape[0] != item.shape[axis]:
                errors.append(
                    f"{prefix}{name}: axis {axis} extent "
                    f"{item.shape[axis]} != scale {target.name} length "
                    f"{target.shape[0]}"
                )
            # V2: the scale's REFERENCE_LIST points back at (item, axis)
            rl = target.attrs.get("REFERENCE_LIST")
            if rl is None:
                errors.append(
                    f"{prefix}{target.name}: scale missing REFERENCE_LIST"
                )
                continue
            back = False
            for entry in np.atleast_1d(rl):
                ref, ax = entry[0], int(entry[1])
                if f[ref].id == item.id and ax == axis:
                    back = True
                    break
            if not back:
                errors.append(
                    f"{prefix}{target.name}: REFERENCE_LIST lacks the "
                    f"back-pointer to {name} axis {axis}"
                )


def validate_file(path):
    """Returns a list of violation strings (empty = conforms)."""
    errors = []
    with h5py.File(path, "r") as f:
        if "_NCProperties" not in f.attrs:
            errors.append("root: missing _NCProperties provenance stamp")
        groups = [
            (name + "/", item)
            for name, item in f.items()
            if isinstance(item, h5py.Group)
        ]
        if not groups:
            groups = [("", f)]
        for prefix, g in groups:
            validate_group(f, g, errors, prefix=prefix)
    return errors


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    bad = 0
    for path in sys.argv[1:]:
        errors = validate_file(path)
        if errors:
            bad += 1
            print(f"{path}: {len(errors)} violation(s)")
            for e in errors:
                print(f"  - {e}")
        else:
            print(f"{path}: conforms to the netCDF-4 profile")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
