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

    def test_voigt_profile_option(self, sim, tmp_path):
        """--profile voigt flows through to the spectra engine and the
        wings carry more optical depth than the Gaussian run."""
        from astro_sph_tools_tpu.scripts.sightlines_cli import main

        root, snap_path, *_ = sim
        outs = {}
        for name, extra in (
            ("gauss", []),
            ("voigt", ["--profile", "voigt", "--gamma", "6.265e8"]),
        ):
            out = str(tmp_path / f"rays_{name}.hdf5")
            rc = main([
                "--snapshot", snap_path, "--output", out,
                "--n-rays", "8", "--spectra", "--spectra-bins", "512",
            ] + extra)
            assert rc == 0
            with h5py.File(out, "r") as f:
                outs[name] = np.asarray(f["Spectra/tau"])
        g, v = outs["gauss"], outs["voigt"]
        assert g.shape == v.shape
        # same integrated column (normalised profiles)...
        np.testing.assert_allclose(g.sum(), v.sum(), rtol=1e-3)
        # ...but the Voigt run moves depth into the wings: the per-ray
        # minimum (far-wing) tau is strictly larger where columns exist
        live = g.sum(axis=1) > 0
        assert (v[live].min(axis=1) >= g[live].min(axis=1)).all()
        assert v[live].min() > 0 or (v[live].min(axis=1) > g[live].min(axis=1)).any()

    def test_voigt_requires_gamma_cli(self, sim, tmp_path):
        from astro_sph_tools_tpu.scripts.sightlines_cli import main

        root, snap_path, *_ = sim
        with pytest.raises(ValueError, match="damping rate"):
            main([
                "--snapshot", snap_path,
                "--output", str(tmp_path / "x.hdf5"),
                "--n-rays", "4", "--spectra", "--profile", "voigt",
            ])

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
    def test_region_bounds_construction(self, tmp_path, monkeypatch):
        """--region/--region-pad must restrict the LOADING region on the
        correct axes (map plane padded, projection axis full box)."""
        from astro_sph_tools_tpu.io.eagle import SnapshotEAGLE
        from astro_sph_tools_tpu.io.synthetic import (
            SyntheticSnapshotSpec,
            write_snapshot,
        )
        from astro_sph_tools_tpu.scripts.render_map import main

        spec = SyntheticSnapshotSpec(n_gas=512, n_dm=16, n_star=8, n_bh=2)
        path, _ = write_snapshot(str(tmp_path), spec)
        captured = {}
        real = SnapshotEAGLE.restrict_data_comoving_loading_region

        def spy(self, *bounds):
            captured["bounds"] = bounds
            return real(self, *bounds)

        monkeypatch.setattr(
            SnapshotEAGLE, "restrict_data_comoving_loading_region", spy
        )
        out = str(tmp_path / "m.hdf5")
        rc = main([
            "--snapshot", path, "--output", out, "--resolution", "16",
            "--axis", "y",  # projection plane = (z, x); y stays full box
            "--region", "2,6,3,7", "--region-pad", "0.5",
            "--engine", "xla",
        ])
        assert rc == 0
        zx0, zx1, y0, y1, xx0, xx1 = captured["bounds"]
        # axis "y": projection_plane = (i, j); i maps region x-range, j the
        # y-range; the remaining axis spans the box
        i, j = 0, 2  # CoordinateAxes.Y.projection_plane
        b = [[zx0, zx1], [y0, y1], [xx0, xx1]]
        assert b[i] == [2 - 0.5, 6 + 0.5]
        assert b[j] == [3 - 0.5, 7 + 0.5]
        assert b[1] == [0.0, 10.0]

    @pytest.mark.slow
    def test_region_render_prunes_reads_and_matches_full(self, tmp_path, monkeypatch):
        """A restricted render must read fewer file rows than a full-pad
        render while producing the same map, given a pad covering every
        kernel support (h_max ~0.79 Mpc at this particle count => 2h < 1.6)."""
        import astro_sph_tools_tpu.io.eagle as eagle_mod
        from astro_sph_tools_tpu.io.synthetic import (
            SyntheticSnapshotSpec,
            write_snapshot,
        )
        from astro_sph_tools_tpu.scripts.render_map import main

        spec = SyntheticSnapshotSpec(
            n_gas=65536, n_dm=32, n_star=8, n_bh=2, n_files=16,
            spatial_order=True,
        )
        path, truth = write_snapshot(str(tmp_path), spec)

        def run(out, pad, opens):
            real_file = h5py.File

            def wrapper(p_, *a, **kw):
                opens.append(str(p_))
                return real_file(p_, *a, **kw)

            with pytest.MonkeyPatch.context() as mp:
                mp.setattr(eagle_mod.h5py, "File", wrapper)
                rc = main([
                    "--snapshot", path, "--output", out, "--resolution", "32",
                    "--region", "1.8,3.0,1.8,3.0", "--region-pad", str(pad),
                    "--engine", "xla",
                ])
            assert rc == 0

        full_opens: list = []
        reg_opens: list = []
        full = str(tmp_path / "full.hdf5")
        restricted = str(tmp_path / "restricted.hdf5")
        run(full, 100.0, full_opens)     # pad > box: reads everything
        run(restricted, 1.6, reg_opens)  # honest pad (2*h_max ~ 1.57): must prune
        with h5py.File(full, "r") as a, h5py.File(restricted, "r") as b:
            sa = np.asarray(a["surface_density"])
            sb = np.asarray(b["surface_density"])
        assert sa.sum() > 0
        # contributor sets are identical; accumulation order differs between
        # the two read batchings, so allow f32 reduction-order noise
        np.testing.assert_allclose(sb, sa, rtol=1e-5, atol=1e-10)
        # the padded region (0.2..4.6)^2 x full z sits inside the low-xy
        # quadrant and selects ~6/16 Morton-ordered files (library-level
        # pruning is pinned in test_io_eagle); the one-time index build
        # opens every file once, so the IO saving shows in TOTAL opens:
        # every per-field read loop touches only the selected files
        snap_full = [o for o in full_opens if "snap_" in o]
        snap_reg = [o for o in reg_opens if "snap_" in o]
        assert len(snap_reg) < 0.75 * len(snap_full)
