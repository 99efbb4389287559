"""Coherent-order deposit engine: equivalence to the sorted engine, oracle
fidelity, row classification, and degradation on incoherent input."""

import numpy as np
import pytest

from astro_sph_tools_tpu.ops.deposit import MapSpec
from astro_sph_tools_tpu.ops.deposit_coherent import (
    deposit_2d_coherent,
    deposit_coherent,
    tile_particles_coherent,
)
from astro_sph_tools_tpu.ops.deposit_pallas import deposit_2d_auto

from oracles import project_oracle

# compile-heavy (interpret-mode Pallas / shard_map meshes): slow lane
pytestmark = pytest.mark.slow


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _coherent_set(rng, n, box, px, h_sigma=0.6, h_clip=12.0):
    """Cell-ordered (snapshot-like) clustered particles with density-
    correlated smoothing lengths."""
    cx = rng.uniform(0, box, n)
    cy = rng.uniform(0, box, n)
    cell = (
        np.floor(cy / (box / 32)).astype(int) * 32
        + np.floor(cx / (box / 32)).astype(int)
    )
    order = np.argsort(cell, kind="stable")
    x, y = cx[order].astype(np.float32), cy[order].astype(np.float32)
    dens = rng.uniform(0.3, 3.0, 1024)[cell[order]]
    h = np.clip(
        0.6 * px * dens ** (-1 / 3) * np.exp(h_sigma * rng.normal(size=n)),
        0.05 * px,
        h_clip * px,
    ).astype(np.float32)
    m = rng.uniform(0.5, 2.0, n).astype(np.float32)
    return x, y, h, m


class TestCoherentEngine:
    def test_matches_sorted_engine_multilevel(self, rng):
        box = 10.0
        spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 128
        x, y, h, m = _coherent_set(rng, 60000, box, px)
        fields = np.stack([m, (m * rng.uniform(1, 2, x.size)).astype(np.float32)])
        lay = tile_particles_coherent(x, y, h, fields, spec)
        # snapshot-like order: most rows deposit in place
        assert lay.stats["coherent_fraction"] > 0.7
        img_c = np.asarray(deposit_coherent(lay, precision="f32"))
        img_s = np.asarray(deposit_2d_auto(x, y, h, fields, spec, precision="f32"))
        assert np.abs(img_c - img_s).max() / np.abs(img_s).max() < 5e-6

    def test_random_order_degrades_to_sorted(self, rng):
        box = 10.0
        spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 128
        x, y, h, m = _coherent_set(rng, 30000, box, px)
        p = rng.permutation(x.size)
        fields = np.stack([m])
        lay = tile_particles_coherent(x[p], y[p], h[p], fields[:, p], spec)
        # incoherent input: rows route to the sorted tail
        assert lay.stats["coherent_fraction"] < 0.2
        img_c = np.asarray(deposit_coherent(lay, precision="f32"))
        img_s = np.asarray(
            deposit_2d_auto(x, y, h, fields, spec, precision="f32")
        )
        assert np.abs(img_c - img_s).max() / np.abs(img_s).max() < 5e-6

    def test_matches_oracle_nonperiodic(self, rng):
        box = 8.0
        spec = MapSpec(shape=(64, 64), extent=(0, box, 0, box))
        px = box / 64
        x, y, h, m = _coherent_set(rng, 12000, box, px, h_clip=8.0)
        img = np.asarray(deposit_2d_coherent(x, y, h, m, spec, precision="f32"))
        exp = project_oracle(x, y, h, m, spec.shape, spec.extent)
        assert np.abs(img - exp).max() / np.abs(exp).max() < 2e-5

    def test_single_field_shape_and_bf16x2(self, rng):
        box = 8.0
        spec = MapSpec(shape=(64, 64), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 64
        x, y, h, m = _coherent_set(rng, 8000, box, px)
        img = np.asarray(deposit_2d_coherent(x, y, h, m, spec, precision="bf16x2"))
        assert img.shape == (64, 64)
        exp = project_oracle(
            x, y, h, m, spec.shape, spec.extent, periodic=True
        )
        assert np.abs(img - exp).max() / np.abs(exp).max() < 5e-4  # bf16x2 class

    def test_oversize_fallback(self, rng):
        box = 8.0
        spec = MapSpec(shape=(64, 64), extent=(0, box, 0, box))
        px = box / 64
        x, y, h, m = _coherent_set(rng, 6000, box, px)
        h = h.copy()
        h[::1500] = 40 * px  # beyond the K=64 window -> dense fallback
        lay = tile_particles_coherent(x, y, h, np.stack([m]), spec)
        assert lay.n_tail_oversize > 0
        img = np.asarray(deposit_coherent(lay, precision="f32"))[0]
        img_s = np.asarray(
            deposit_2d_auto(x, y, h, np.stack([m]), spec, precision="f32")
        )[0]
        # must take the same dense-fallback path as the sorted engine (the
        # f32 world-coordinate recovery there carries a shared ~2e-5 class
        # vs the f64 oracle for huge-h particles)
        assert np.abs(img - img_s).max() / np.abs(img_s).max() < 1e-6
        exp = project_oracle(x, y, h, m, spec.shape, spec.extent)
        assert np.abs(img - exp).max() / np.abs(exp).max() < 5e-5

    def test_too_many_fields_rejected(self, rng):
        box = 8.0
        spec = MapSpec(shape=(64, 64), extent=(0, box, 0, box))
        x, y, h, m = _coherent_set(rng, 4000, box, box / 64)
        fields = np.stack([m] * 5)
        with pytest.raises(ValueError, match="4 fields"):
            tile_particles_coherent(x, y, h, fields, spec)

    def test_tail_bucket_boundaries(self, rng):
        """Rows whose tail counts land exactly on pow2 bucket edges (32, 33,
        64, 2048) must extract losslessly through the bucketed gather."""
        from astro_sph_tools_tpu.ops.deposit_coherent import _TAIL_BUCKETS
        from astro_sph_tools_tpu.ops.deposit_pallas import _CHUNK

        box = 10.0
        spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 128
        n = 8 * _CHUNK  # 8 rows, one per engineered tail size
        x, y, h, m = _coherent_set(rng, n, box, px, h_sigma=0.0)
        h = np.full(n, 0.3 * px, np.float32)  # all level-0 baseline
        # row r gets exactly `sizes[r]` large-h (level>=1) lanes
        sizes = [0, 1, _TAIL_BUCKETS[0], _TAIL_BUCKETS[0] + 1,
                 _TAIL_BUCKETS[1], 100, _TAIL_BUCKETS[-1] - 1, _CHUNK]
        for r, s in enumerate(sizes):
            h[r * _CHUNK : r * _CHUNK + s] = 6.0 * px
        fields = np.stack([m])
        lay = tile_particles_coherent(x, y, h, fields, spec)
        assert lay.stats["tail_particles"] >= sum(sizes)
        img_c = np.asarray(deposit_coherent(lay, precision="f32"))
        img_s = np.asarray(deposit_2d_auto(x, y, h, fields, spec, precision="f32"))
        assert np.abs(img_c - img_s).max() / np.abs(img_s).max() < 5e-6

    def test_gather_program_variety_bounded(self, rng):
        """Two snapshots with different tail distributions in the same pow2
        capacity classes must share one compiled gather program (the
        resident-service no-recompile guarantee)."""
        import importlib

        dc = importlib.import_module(
            "astro_sph_tools_tpu.ops.deposit_coherent"
        )

        box = 10.0
        spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 128
        x, y, h, m = _coherent_set(rng, 60000, box, px)
        tile_particles_coherent(x, y, h, np.stack([m]), spec)
        before = dc._cached_tail_gather.cache_info()
        # jitter positions/lengths: counts shift, pow2 caps typically do not
        x2 = np.mod(x + rng.normal(0, 0.01, x.size).astype(np.float32), box)
        lay2 = tile_particles_coherent(x2, y, h, np.stack([m]), spec)
        after = dc._cached_tail_gather.cache_info()
        if lay2.stats["tail_particles"]:
            assert after.hits > before.hits or after.misses == before.misses

    @pytest.mark.parametrize("periodic", [True, False])
    def test_pallas_prep_matches_xla_stage_a(self, rng, periodic):
        """The fused Pallas row-prep (coherent_prep_pallas) must produce the
        same layout invariants and the same rendered image as the XLA
        stage A it replaces, including heavy rows, off-extent particles on
        non-periodic maps, and multi-level tails."""
        from astro_sph_tools_tpu.ops.deposit_pallas import _CHUNK

        box = 10.0
        spec = MapSpec(
            shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=periodic
        )
        px = box / 128
        n = 6 * _CHUNK + 37  # non-chunk-aligned
        x, y, h, m = _coherent_set(rng, n, box, px)
        # make some rows heavy (random order) and push lanes off-extent
        sl = slice(2 * _CHUNK, 3 * _CHUNK)
        x[sl] = rng.uniform(0, box, _CHUNK).astype(np.float32)
        y[sl] = rng.uniform(0, box, _CHUNK).astype(np.float32)
        if not periodic:
            x[::131] += 1.5 * box  # off-extent support clipping path
        fields = np.stack([m, (m * 0.5).astype(np.float32)])
        lays = {
            prep: tile_particles_coherent(x, y, h, fields, spec, prep=prep)
            for prep in ("xla", "pallas")
        }
        for key in ("n_candidates", "heavy_rows", "tail_particles",
                    "routed_particles", "tail_bucket_rows"):
            assert lays["pallas"].stats[key] == lays["xla"].stats[key], key
        imgs = {
            prep: np.asarray(deposit_coherent(lay, precision="f32"))
            for prep, lay in lays.items()
        }
        rel = (
            np.abs(imgs["pallas"] - imgs["xla"]).max()
            / np.abs(imgs["xla"]).max()
        )
        assert rel < 1e-5

    def test_integrated_projection(self, rng):
        box = 8.0
        spec = MapSpec(shape=(64, 64), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 64
        x, y, h, m = _coherent_set(rng, 8000, box, px)
        img_c = np.asarray(
            deposit_2d_coherent(
                x, y, h, m, spec, precision="f32", projection="integrated"
            )
        )
        img_s = np.asarray(
            deposit_2d_auto(
                x, y, h, np.stack([m]), spec, precision="f32",
                projection="integrated",
            )
        )[0]
        assert np.abs(img_c - img_s).max() / np.abs(img_s).max() < 5e-6


class TestWindowSchedule:
    """W-lane window steps + per-window K4/K8 column loops: exact vs the
    whole-row schedule on every input regime."""

    def test_matches_whole_row_multilevel(self, rng):
        box = 10.0
        spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 128
        x, y, h, m = _coherent_set(rng, 60000, box, px)
        fields = np.stack([m, (m * rng.uniform(1, 2, x.size)).astype(np.float32)])
        ref = np.asarray(deposit_2d_coherent(x, y, h, fields, spec, precision="f32"))
        for W in (256, 512, 1024):
            img = np.asarray(
                deposit_2d_coherent(
                    x, y, h, fields, spec, precision="f32", window=W
                )
            )
            assert np.abs(img - ref).max() / np.abs(ref).max() < 1e-6, W

    def test_all_subpixel_k4_only(self, rng):
        """Every lane sub-pixel: the schedule is pure K4 and must stay exact
        (covers the short column loop + its anchor)."""
        box = 10.0
        spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 128
        x, y, h, m = _coherent_set(rng, 30000, box, px)
        h = np.minimum(h, 0.45 * px)  # s_pix = 2h/px <= 0.9 < K4 bound
        lay = tile_particles_coherent(x, y, h, m, spec, window=512)
        assert lay.stats["n_window_steps"] > 0
        img = np.asarray(deposit_coherent(lay, precision="f32"))
        ref = np.asarray(deposit_2d_coherent(x, y, h, m, spec, precision="f32"))
        assert np.abs(img - ref).max() / np.abs(ref).max() < 1e-6

    def test_random_order_heavy_rows(self, rng):
        """Incoherent input routes whole rows to the tail; the (nearly empty)
        window schedule must not corrupt the map."""
        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 64
        n = 30000
        x = rng.uniform(0, box, n).astype(np.float32)
        y = rng.uniform(0, box, n).astype(np.float32)
        h = np.clip(
            0.6 * px * np.exp(0.6 * rng.normal(size=n)), 0.05 * px, 10 * px
        ).astype(np.float32)
        m = rng.uniform(0.5, 2.0, n).astype(np.float32)
        ref = np.asarray(deposit_2d_coherent(x, y, h, m, spec, precision="f32"))
        img = np.asarray(
            deposit_2d_coherent(x, y, h, m, spec, precision="f32", window=512)
        )
        assert np.abs(img - ref).max() / np.abs(ref).max() < 1e-6

    def test_nonperiodic_off_extent(self, rng):
        """Non-periodic map with support spilling past the extent (halo
        cutout shape): the K4 anchor must respect the col_ok mask."""
        box = 8.0
        spec = MapSpec(shape=(64, 64), extent=(0, box, 0, box), periodic_wrap=False)
        px = box / 64
        n = 20000
        x = rng.uniform(-0.5, box + 0.5, n).astype(np.float32)
        y = rng.uniform(-0.5, box + 0.5, n).astype(np.float32)
        h = np.clip(
            0.5 * px * np.exp(0.5 * rng.normal(size=n)), 0.05 * px, 6 * px
        ).astype(np.float32)
        m = rng.uniform(0.5, 2.0, n).astype(np.float32)
        ref = np.asarray(deposit_2d_coherent(x, y, h, m, spec, precision="f32"))
        img = np.asarray(
            deposit_2d_coherent(x, y, h, m, spec, precision="f32", window=512)
        )
        assert np.abs(img - ref).max() / max(np.abs(ref).max(), 1e-30) < 1e-6

    def test_k4_bound_mirrors_prep_module(self):
        """The Pallas prep mirrors deposit_coherent's K4 classification
        bound (kept as a literal to avoid import-order coupling)."""
        import importlib

        cp = importlib.import_module(
            "astro_sph_tools_tpu.ops.coherent_prep_pallas"
        )
        dc = importlib.import_module(
            "astro_sph_tools_tpu.ops.deposit_coherent"
        )
        assert cp._K4_MAX_S == dc._K4_MAX_S

    @pytest.mark.parametrize("prep", ["xla", "pallas"])
    def test_whole_row_kclass_mixed_candidates(self, rng, prep):
        """Whole-row schedule with per-candidate kclass: engineered rows
        holding both all-sub-pixel candidates (K4 steps) and candidates
        with one wide lane (full-K steps) must stay exact vs the oracle
        and vs a layout with the classification disabled."""
        import importlib

        dc = importlib.import_module(
            "astro_sph_tools_tpu.ops.deposit_coherent"
        )
        from astro_sph_tools_tpu.ops.deposit_pallas import _CHUNK

        box = 10.0
        spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 128
        n = 8 * _CHUNK
        x, y, h, m = _coherent_set(rng, n, box, px, h_sigma=0.0)
        h = np.full(n, 0.3 * px, np.float32)  # sub-pixel baseline (K4)
        # odd rows get a single wide-but-level-0 lane per tile-key group:
        # s_pix just over the K4 bound but inside the K=8 level
        for r in range(1, 8, 2):
            h[r * _CHUNK : (r + 1) * _CHUNK : 97] = 0.7 * px
        fields = np.stack([m])
        lay = tile_particles_coherent(x, y, h, fields, spec, prep=prep)
        assert lay.cand_k4 is not None
        k4_live = int(np.asarray(lay.cand_k4).sum())  # pads carry 0
        assert 0 < k4_live < lay.n_cand  # both classes present
        img = np.asarray(deposit_coherent(lay, precision="f32"))
        # same layout, classification stripped -> every step runs full K
        import dataclasses

        lay_off = dataclasses.replace(lay, cand_k4=None)
        ref = np.asarray(deposit_coherent(lay_off, precision="f32"))
        assert np.abs(img - ref).max() / np.abs(ref).max() < 1e-6
        oracle = np.asarray(
            deposit_2d_auto(x, y, h, fields, spec, precision="f32")
        )
        assert np.abs(img - oracle).max() / np.abs(oracle).max() < 5e-6

    def test_window_stats_and_validation(self, rng):
        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 64
        x, y, h, m = _coherent_set(rng, 20000, box, px)
        lay = tile_particles_coherent(x, y, h, m, spec, window=512)
        st = lay.stats
        # every coherent row's head contributes at least one window step
        assert st["n_window_steps"] >= st["n_candidates"] > 0
        assert lay.b0w >= st["n_window_steps"]
        assert len(lay.cand_win) == 3
        import pytest as _pytest

        with _pytest.raises(ValueError, match="power of two"):
            tile_particles_coherent(x, y, h, m, spec, window=300)
        with _pytest.raises(ValueError, match="prep"):
            tile_particles_coherent(x, y, h, m, spec, window=512, prep="pallas")
