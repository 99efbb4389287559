"""Schema-tolerance fuzz for the EAGLE reader (VERDICT r3 item 9).

No real EAGLE output is available in this environment, so these tests
approximate real-data validation by mutating synthetic files into the
schema variants real archives contain (reference schema spec:
`_SnapshotEAGLE.py:78-113`) and asserting the reader either adapts or
fails gracefully through the `io.errors` taxonomy — never a bare
KeyError or a silent empty array.
"""

import h5py
import numpy as np
import pytest

from astro_sph_tools_tpu.data_structures import ParticleType
from astro_sph_tools_tpu.io.eagle import SnapshotEAGLE
from astro_sph_tools_tpu.io.errors import (
    SnapshotFormatError,
    SnipshotFieldError,
    SnipshotOperationError,
)
from astro_sph_tools_tpu.io.synthetic import (
    SyntheticSnapshotSpec,
    write_snapshot,
)


def _snapshot(tmp_path, **kw):
    spec = SyntheticSnapshotSpec(
        n_gas=256, n_dm=128, n_star=32, n_bh=2, n_files=2, **kw
    )
    return write_snapshot(str(tmp_path), spec)


def _all_files(first_path):
    import glob

    stem = first_path.rsplit(".", 2)[0]
    return sorted(glob.glob(f"{stem}.*.hdf5"))


class TestHeaderVariants:
    def test_missing_units_group_is_format_error(self, tmp_path):
        path, _ = _snapshot(tmp_path)
        with h5py.File(path, "r+") as f:
            del f["Units"]
        with pytest.raises(SnapshotFormatError, match="Units"):
            SnapshotEAGLE(path)

    def test_missing_omega_baryon_is_format_error(self, tmp_path):
        path, _ = _snapshot(tmp_path)
        with h5py.File(path, "r+") as f:
            del f["Header"].attrs["OmegaBaryon"]
        with pytest.raises(SnapshotFormatError, match="OmegaBaryon"):
            SnapshotEAGLE(path)

    def test_f32_mass_table_and_attrs(self, tmp_path):
        """Archives store some headers in f32; values must still read."""
        path, truth = _snapshot(tmp_path)
        with h5py.File(path, "r+") as f:
            mt = np.asarray(f["Header"].attrs["MassTable"], np.float32)
            f["Header"].attrs["MassTable"] = mt
            f["Header"].attrs["BoxSize"] = np.float32(
                f["Header"].attrs["BoxSize"]
            )
        snap = SnapshotEAGLE(path)
        assert np.isclose(
            float(snap.dark_matter_particle_mass.to_value("Msun")),
            truth.dm_particle_mass,
            rtol=1e-5,
        )

    def test_f32_coordinate_datasets(self, tmp_path):
        """On-disk f32 datasets (the real storage dtype) read losslessly
        into the f64 unit pipeline."""
        path, truth = _snapshot(tmp_path)
        for fp in _all_files(path):
            with h5py.File(fp, "r+") as f:
                for ptg in ("PartType0", "PartType1"):
                    raw = np.asarray(f[f"{ptg}/Coordinates"], np.float32)
                    attrs = dict(f[f"{ptg}/Coordinates"].attrs)
                    del f[f"{ptg}/Coordinates"]
                    ds = f[ptg].create_dataset("Coordinates", data=raw)
                    for k, v in attrs.items():
                        ds.attrs[k] = v
        snap = SnapshotEAGLE(path)
        pos = snap.get_positions(ParticleType.gas).to_value("Mpc")
        np.testing.assert_allclose(
            pos, truth.positions[ParticleType.gas], rtol=2e-7, atol=1e-6
        )

    def test_missing_dataset_is_format_error_not_silent(self, tmp_path):
        """A dataset absent from every file of a populated particle group
        must raise, not return an empty array."""
        path, _ = _snapshot(tmp_path)
        for fp in _all_files(path):
            with h5py.File(fp, "r+") as f:
                del f["PartType0/Temperature"]
        snap = SnapshotEAGLE(path)
        with pytest.raises(SnapshotFormatError, match="Temperature"):
            snap.get_temperatures(ParticleType.gas)


class TestSnipshotSubset:
    def test_snipshot_reduced_fields(self, tmp_path):
        path, truth = _snapshot(tmp_path, snipshot=True)
        assert "snipshot_" in path and "/snip_" in path
        snap = SnapshotEAGLE(path)
        assert snap.is_snipshot
        # present fields read normally
        pos = snap.get_positions(ParticleType.gas).to_value("Mpc")
        assert pos.shape == truth.positions[ParticleType.gas].shape
        # snipshot-absent fields fail through the snipshot taxonomy
        with pytest.raises(SnipshotFieldError):
            snap.get_temperatures(ParticleType.gas)
        with pytest.raises((SnipshotFieldError, SnipshotOperationError)):
            snap.get_elemental_abundance(ParticleType.gas, "O")

    def test_snipshot_number_densities_need_default_abundance(self, tmp_path):
        path, _ = _snapshot(tmp_path, snipshot=True)
        snap = SnapshotEAGLE(path)
        with pytest.raises(SnipshotOperationError):
            snap.get_number_densities(ParticleType.gas, "H")
        n_h = snap.get_number_densities(
            ParticleType.gas, "H", default_abundance=0.75
        )
        assert np.isfinite(n_h.value).all() and (n_h.value > 0).all()
