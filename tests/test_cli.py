"""CLI pipeline tests over synthetic datasets."""

import h5py
import numpy as np
import pytest

from astro_sph_tools_tpu.io.synthetic import (
    SyntheticSnapshotSpec,
    write_catalogue,
    write_snapshot,
)
from astro_sph_tools_tpu.scripts.params import Param, ScriptWrapper, comma_separated


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    spec = SyntheticSnapshotSpec(
        n_gas=1024, n_dm=256, n_star=64, n_bh=2, n_files=2, n_groups=6, clustered=True
    )
    root = tmp_path_factory.mktemp("cli_sim")
    path, truth = write_snapshot(str(root), spec)
    write_catalogue(str(root), spec, truth)
    return str(root), path, truth, spec


class TestParamSpec:
    def test_typed_parse(self):
        wrapper = ScriptWrapper(
            "demo", "", (
                Param("count", "c", "", int, default=3),
                Param("names", None, "", conversion=comma_separated(str), default=[]),
                Param("go", None, "", is_flag=True),
            ),
        )
        args = wrapper.parse(["--count", "7", "--names", "a,b", "--go"])
        assert args == {"count": 7, "names": ["a", "b"], "go": True}

    def test_conflicts(self):
        wrapper = ScriptWrapper(
            "demo", "", (
                Param("eagle", None, "", is_flag=True, conflicts=("swift",)),
                Param("swift", None, "", is_flag=True),
            ),
        )
        with pytest.raises(SystemExit):
            wrapper.parse(["--eagle", "--swift"])

    def test_required(self):
        wrapper = ScriptWrapper("demo", "", (Param("path", None, "", str, required=True),))
        with pytest.raises(SystemExit):
            wrapper.parse([])


class TestAstCli:
    def test_hello(self, capsys):
        from astro_sph_tools_tpu.scripts.ast_cli import main

        assert main([]) == 0
        out = capsys.readouterr().out
        assert "astro-sph-tools-tpu" in out


class TestFindNearestHaloes:
    def test_end_to_end(self, sim, tmp_path):
        from astro_sph_tools_tpu.scripts.find_nearest_haloes import main

        root, _, truth, spec = sim
        out_stem = str(tmp_path / "nearest")
        rc = main([
            "--target-redshift", "0.5", "--eagle",
            "--input-directory", root,
            "--output-filepath", out_stem,
            "--minimum-log10-halo-masses", "11.0,12.0",
        ])
        assert rc == 0
        with h5py.File(out_stem + ".hdf5", "r") as f:
            grp = f[[k for k in f.keys()][0]]
            ids = np.asarray(grp["halo_indexes"])
            dist = np.asarray(grp["halo_comoving_distance"])
            assert ids.shape == (spec.n_gas,)
            assert (dist >= 0).all() and np.isfinite(dist).all()
            assert "minimum_halo_mass_limited/11.00" in grp

    def test_existing_dataset_guard(self, sim, tmp_path):
        from astro_sph_tools_tpu.scripts.find_nearest_haloes import main

        root, *_ = sim
        out_stem = str(tmp_path / "nearest2")
        argv = [
            "--target-redshift", "0.5", "--eagle",
            "--input-directory", root, "--output-filepath", out_stem,
        ]
        assert main(argv) == 0
        assert main(argv) == 1  # guard refuses without --overwrite
        assert main(argv + ["--overwrite"]) == 0

    def test_requires_format_flag(self, sim, tmp_path):
        from astro_sph_tools_tpu.scripts.find_nearest_haloes import main

        root, *_ = sim
        rc = main([
            "--target-redshift", "0.5",
            "--input-directory", root,
            "--output-filepath", str(tmp_path / "x"),
        ])
        assert rc == 1


class TestRenderMap:
    def test_render_density_and_temperature(self, sim, tmp_path):
        from astro_sph_tools_tpu.scripts.render_map import main

        root, snap_path, truth, spec = sim
        out = str(tmp_path / "maps.hdf5")
        rc = main([
            "--snapshot", snap_path, "--format", "eagle",
            "--output", out, "--resolution", "64",
            "--fields", "density,temperature",
            "--engine", "xla",
        ])
        assert rc == 0
        with h5py.File(out, "r") as f:
            sd = np.asarray(f["surface_density"])
            assert sd.shape == (64, 64)
            assert sd.sum() > 0
            assert "mean_temperature" in f
            mt = np.asarray(f["mean_temperature"])
            covered = np.asarray(f["surface_density"]) > 0
            assert (mt[covered] > 0).any()

    def test_render_region_and_png(self, sim, tmp_path):
        from astro_sph_tools_tpu.scripts.render_map import main

        root, snap_path, truth, spec = sim
        out = str(tmp_path / "region.hdf5")
        png = str(tmp_path / "region.png")
        rc = main([
            "--snapshot", snap_path, "--output", out, "--png", png,
            "--resolution", "32", "--region", "2,8,2,8", "--engine", "xla",
        ])
        assert rc == 0
        import os

        assert os.path.exists(png)

    def test_unknown_field_rejected(self, sim, tmp_path):
        from astro_sph_tools_tpu.scripts.render_map import main

        root, snap_path, *_ = sim
        with pytest.raises(SystemExit):
            main([
                "--snapshot", snap_path, "--output", str(tmp_path / "x.hdf5"),
                "--fields", "entropy", "--engine", "xla", "--resolution", "16",
            ])


class TestSightlinesCli:
    def test_columns_and_spectra(self, sim, tmp_path):
        from astro_sph_tools_tpu.scripts.sightlines_cli import main

        root, snap_path, truth, spec = sim
        out = str(tmp_path / "rays.hdf5")
        rc = main([
            "--snapshot", snap_path, "--output", out,
            "--n-rays", "32", "--spectra", "--spectra-bins", "512",
        ])
        assert rc == 0
        with h5py.File(out, "r") as f:
            cols = np.asarray(f["column_density"])
            assert cols.shape == (32,)
            assert (cols >= 0).all() and cols.max() > 0
            tau = np.asarray(f["Spectra/tau"])
            assert tau.shape == (32, 512)
            # velocity integral consistent with the column for a few rays
            v = np.asarray(f["Spectra/velocity_kms"])
            dv = v[1] - v[0]
            np.testing.assert_allclose(tau.sum(axis=1) * dv, cols, rtol=2e-2)

    def test_ray_file_input(self, sim, tmp_path):
        from astro_sph_tools_tpu.scripts.sightlines_cli import main

        root, snap_path, *_ = sim
        ray_file = tmp_path / "rays.txt"
        ray_file.write_text("2.0 3.0\n7.5 8.0\n")
        out = str(tmp_path / "rays2.hdf5")
        rc = main(["--snapshot", snap_path, "--output", out, "--ray-file", str(ray_file)])
        assert rc == 0
        with h5py.File(out, "r") as f:
            assert np.asarray(f["ray_x"]).shape == (2,)


class TestRenderMapRestrictedIO:
    def test_region_render_restricts_reads_and_matches_full(self, tmp_path):
        """--region must both restrict the IO (spatial index) and produce
        the same map as a full-box read over the same extent, given enough
        --region-pad to cover boundary kernels."""
        from astro_sph_tools_tpu.scripts.render_map import main
        from astro_sph_tools_tpu.io.synthetic import (
            SyntheticSnapshotSpec,
            write_snapshot,
        )

        spec = SyntheticSnapshotSpec(
            n_gas=2048, n_dm=32, n_star=8, n_bh=2, n_files=8,
            spatial_order=True,
        )
        path, truth = write_snapshot(str(tmp_path), spec)

        full = str(tmp_path / "full.hdf5")
        rc = main([
            "--snapshot", path, "--output", full, "--resolution", "32",
            "--region", "2,6,3,7", "--region-pad", "100",  # pad > box: no IO pruning
            "--engine", "xla",
        ])
        assert rc == 0
        restricted = str(tmp_path / "restricted.hdf5")
        rc = main([
            "--snapshot", path, "--output", restricted, "--resolution", "32",
            "--region", "2,6,3,7", "--region-pad", "3.0",
            "--engine", "xla",
        ])
        assert rc == 0
        with h5py.File(full, "r") as a, h5py.File(restricted, "r") as b:
            sa = np.asarray(a["surface_density"])
            sb = np.asarray(b["surface_density"])
        assert sa.sum() > 0
        # pad of 3 cMpc covers every kernel support (max h ~ 1 Mpc here)
        np.testing.assert_allclose(sb, sa, rtol=1e-6, atol=1e-10)
