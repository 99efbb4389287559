"""BASELINE metric at the stated scale: 1e8-particle snapshot -> 1024^2
multi-field adaptive-h map stack, end-to-end wall-clock on one chip.

Writes (once, cached in /tmp) a lean EAGLE-schema snapshot with 2^27 ~ 1.34e8
gas particles (clustered positions, log-normal smoothing lengths spanning the
K=8..64 footprint levels), then streams it through the production pipeline in
file-split macro-chunks: h5py read + unit conversion -> device tile sort ->
fused Pallas deposit, maps accumulated across chunks (the deposit is linear).
Chunking bounds HBM to the known-good 33.5M working set and lets later chunks'
HDF5 reads overlap earlier chunks' device work.

Run on the TPU host:  python benchmarks/e2e_1e8.py [log2_n_gas] [n_chunks]
Emits one JSON line: {"metric": "e2e_snapshot_to_map_1024", ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOX_MPC = 25.0
RESOLUTION = 1024


def write_big_snapshot(directory: str, n_gas: int, n_files: int, seed: int = 11) -> str:
    """Lean EAGLE-schema snapshot: only the datasets the render needs, written
    per-file so host memory stays bounded. Schema/attr recipe matches
    ``io.synthetic.write_snapshot`` (reference `_SnapshotEAGLE.py:78-113`)."""
    from astro_sph_tools_tpu import constants as C
    from astro_sph_tools_tpu.io.synthetic import (
        DENSITY_CGS, LENGTH_CGS, MASS_CGS, MSUN_IN_1E10, VELOCITY_CGS,
        SyntheticSnapshotSpec,
    )
    from astro_sph_tools_tpu.io.synthetic import ENERGY_CGS, PRESSURE_CGS, TIME_CGS

    spec = SyntheticSnapshotSpec(box_size_mpc=BOX_MPC, n_gas=n_gas)
    h = spec.hubble_param
    tag = spec.tag
    snap_dir = os.path.join(directory, f"snapshot_{tag}")
    os.makedirs(snap_dir, exist_ok=True)
    first_path = os.path.join(snap_dir, f"snap_{tag}.0.hdf5")
    if os.path.exists(os.path.join(snap_dir, f"snap_{tag}.{n_files - 1}.hdf5")):
        return first_path

    rng = np.random.default_rng(seed)
    n_dm = 64
    edges = np.linspace(0, n_gas, n_files + 1).astype(int)
    dm_edges = np.linspace(0, n_dm, n_files + 1).astype(int)
    num_part_total = np.zeros(6, np.int64)
    num_part_total[0] = n_gas
    num_part_total[1] = n_dm
    px = BOX_MPC / RESOLUTION
    n_blobs = 64
    blob_centres = rng.uniform(0, BOX_MPC, (n_blobs, 3))

    for fi in range(n_files):
        i0, i1 = int(edges[fi]), int(edges[fi + 1])
        n = i1 - i0
        # clustered positions: half uniform background, half Gaussian blobs
        nb = n // 2
        pos = np.empty((n, 3), np.float32)
        pos[: n - nb] = rng.uniform(0, BOX_MPC, (n - nb, 3)).astype(np.float32)
        which = rng.integers(0, n_blobs, nb)
        pos[n - nb :] = np.mod(
            blob_centres[which] + rng.normal(0, BOX_MPC * 0.02, (nb, 3)), BOX_MPC
        ).astype(np.float32)
        # real EAGLE/SWIFT snapshots store particles in space-filling-curve
        # order (Peano-Hilbert domain cells); writing the fixture unsorted
        # mismodels both the coherent engine's premise and the
        # Morton-delta wire. Sort each file's particles along a 2D Morton
        # key at the wire's 65536-cell resolution.
        from astro_sph_tools_tpu.io.packing import _interleave16

        q = np.clip(pos[:, :2] / BOX_MPC * 65536, 0, 65535).astype(np.uint16)
        order = np.argsort(_interleave16(q[:, 0], q[:, 1]), kind="stable")
        pos = pos[order]
        # log-normal smoothing lengths spanning the footprint levels
        hs = np.exp(rng.normal(np.log(0.9 * px), 0.55, n)).astype(np.float32)
        hs = np.clip(hs, 0.25 * px, 24.0 * px)
        mass = rng.uniform(0.8e6, 1.2e6, n).astype(np.float32)
        temp = np.exp(rng.normal(np.log(1e5), 1.0, n)).astype(np.float32)

        path = os.path.join(snap_dir, f"snap_{tag}.{fi}.hdf5")
        with h5py.File(path, "w") as f:
            hdr = f.create_group("Header")
            hdr.attrs["Redshift"] = spec.redshift
            hdr.attrs["HubbleParam"] = h
            hdr.attrs["ExpansionFactor"] = spec.expansion_factor
            hdr.attrs["OmegaBaryon"] = spec.omega_baryon
            hdr.attrs["Omega0"] = 0.307
            hdr.attrs["NumPart_Total"] = num_part_total
            this_file = np.zeros(6, np.int64)
            this_file[0] = n
            this_file[1] = int(dm_edges[fi + 1] - dm_edges[fi])
            hdr.attrs["NumPart_ThisFile"] = this_file
            hdr.attrs["NumFilesPerSnapshot"] = n_files
            mass_table = np.zeros(6, np.float64)
            mass_table[1] = 6e6 * h * MSUN_IN_1E10
            hdr.attrs["MassTable"] = mass_table
            hdr.attrs["BoxSize"] = BOX_MPC * h

            f.create_group("Constants").attrs["Z_Solar"] = spec.solar_metallicity
            units = f.create_group("Units")
            units.attrs["UnitLength_in_cm"] = LENGTH_CGS
            units.attrs["UnitMass_in_g"] = MASS_CGS
            units.attrs["UnitVelocity_in_cm_per_s"] = VELOCITY_CGS
            units.attrs["UnitDensity_in_cgs"] = DENSITY_CGS
            units.attrs["UnitEnergy_in_cgs"] = ENERGY_CGS
            units.attrs["UnitPressure_in_cgs"] = PRESSURE_CGS
            units.attrs["UnitTime_in_s"] = TIME_CGS

            def attrs(ds, h_exp, a_exp, cgs):
                ds.attrs["h-scale-exponent"] = float(h_exp)
                ds.attrs["aexp-scale-exponent"] = float(a_exp)
                ds.attrs["CGSConversionFactor"] = float(cgs)

            g = f.create_group("PartType0")
            ds = g.create_dataset("Coordinates", data=pos * h)
            attrs(ds, -1.0, 1.0, LENGTH_CGS)
            ds = g.create_dataset("SmoothingLength", data=hs * h)
            attrs(ds, -1.0, 1.0, LENGTH_CGS)
            ds = g.create_dataset("Mass", data=mass * (h * MSUN_IN_1E10))
            attrs(ds, -1.0, 0.0, MASS_CGS)
            ds = g.create_dataset("Temperature", data=temp)
            attrs(ds, 0.0, 0.0, 1.0)

            nd = int(dm_edges[fi + 1] - dm_edges[fi])
            g1 = f.create_group("PartType1")
            ds = g1.create_dataset(
                "Coordinates", data=rng.uniform(0, BOX_MPC, (nd, 3)) * h
            )
            attrs(ds, -1.0, 1.0, LENGTH_CGS)
            ds = g1.create_dataset("Velocity", data=np.zeros((nd, 3), np.float32))
            attrs(ds, 0.0, 0.5, VELOCITY_CGS)
        print(f"  wrote file {fi + 1}/{n_files} ({n:.2e} gas)", flush=True)
    return first_path


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_bench_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from astro_sph_tools_tpu.data_structures import ParticleType
    from astro_sph_tools_tpu.io.eagle import SnapshotEAGLE
    from astro_sph_tools_tpu.ops.deposit import MapSpec
    from astro_sph_tools_tpu.ops.deposit_pallas import deposit_tiled, tile_particles

    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 27
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    # "pack": quantised 10 B/particle wire format (io.packing) instead of
    # 20 B of f32 — the transfer-bound e2e's biggest lever (VERDICT r3 #4).
    # "packraw": additionally skip ALL host-side unit algebra — raw on-disk
    # internal units are quantised directly (one multiply+cast per channel)
    # and the raw->user conversion folds into the device unpack.
    # "packdelta": packraw plus Morton-delta positions + u8-log fields —
    # ~6.3 B/particle on snapshot-ordered data (VERDICT r4 item 2).
    wire = sys.argv[3] if len(sys.argv) > 3 else "f32"
    if wire not in ("f32", "pack", "packraw", "packdelta"):
        raise SystemExit(f"unknown wire format {wire!r}")
    n_readers = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    # render engine: "sorted" (any order) or "coherent" (exploits the
    # snapshot's space-filling-curve storage order — the production
    # choice for real EAGLE/SWIFT/TNG files and the v2 fixture)
    engine = sys.argv[5] if len(sys.argv) > 5 else "sorted"
    if engine not in ("sorted", "coherent"):
        raise SystemExit(f"unknown engine {engine!r}")
    pack_mode = wire != "f32"
    n_gas = 1 << log2_n
    cache = os.path.join("/tmp", f"ast_e2e_big_{log2_n}_v2")  # v2: PH-ordered
    os.makedirs(cache, exist_ok=True)
    t0 = time.perf_counter()
    first = write_big_snapshot(cache, n_gas, n_files=2 * n_chunks)
    t_write = time.perf_counter() - t0
    if t_write > 1:
        print(f"snapshot written in {t_write:.1f}s (one-time)", flush=True)

    spec = MapSpec(
        shape=(RESOLUTION, RESOLUTION), extent=(0.0, BOX_MPC, 0.0, BOX_MPC),
        periodic_wrap=True,
    )

    from astro_sph_tools_tpu.io.prefetch import stream_macro_chunks

    from astro_sph_tools_tpu.io.packing import (
        pack_particles_host,
        unpack_particles_device,
    )

    # power-of-two f16 scales: Msun masses (~1e6) and K temperatures
    # (~1e3.5-1e6) overflow/underflow f16 unscaled; the scale round trip is
    # exact in binary floating point
    MASS_SCALE = 2.0**20
    TEMP_SCALE = 2.0**16

    def read_chunk(ci):
        from astro_sph_tools_tpu import constants as C

        snap = SnapshotEAGLE(first, process_index=ci, n_processes=n_chunks)
        if wire in ("packraw", "packdelta"):
            # raw internal units straight off disk; the only host passes
            # are one multiply+cast per channel (the pack itself). The
            # raw->user scalar conversions ride the device unpack.
            gas = ParticleType.gas
            raw_pos = snap._read_dataset(gas, "Coordinates", trailing=(3,))
            raw_h = snap._read_dataset(gas, "SmoothingLength")
            raw_m = snap._read_dataset(gas, "Mass")
            raw_t = snap._read_dataset(gas, "Temperature")
            s_len = (
                snap.h**snap._length_h_exp * snap._length_cgs
                / C.MEGAPARSEC_CGS
            )
            s_mass = (
                snap.h**snap._mass_h_exp * snap._mass_cgs / C.SOLAR_MASS_CGS
            )
            # raw internal masses (~3e-5) sit in f16 subnormal range:
            # prescale by 2^14 (exact) to keep full f16 precision
            return pack_particles_host(
                np.ascontiguousarray(raw_pos[:, 0]),
                np.ascontiguousarray(raw_pos[:, 1]),
                raw_h, [raw_m, raw_t],
                box=snap._box_internal,
                pos_scale=s_len, h_scale=s_len,
                field_scales=(2.0**-14, TEMP_SCALE),
                field_unpack_scales=(s_mass * 2.0**-14, TEMP_SCALE),
                pos_encoding="auto" if wire == "packdelta" else "u16",
                field_dtype="u8" if wire == "packdelta" else "f16",
            )
        # f32 field output: one fused host pass per field, no grams en route
        snap.output_dtype = np.float32
        pos = snap.get_positions(ParticleType.gas).to_value("Mpc")
        hs = snap.get_smoothing_lengths(ParticleType.gas).to_value("Mpc")
        mass = snap.get_masses(ParticleType.gas).to_value("Msun")
        temp = snap.get_temperatures(ParticleType.gas).to_value("K")
        x = np.ascontiguousarray(pos[:, 0])
        y = np.ascontiguousarray(pos[:, 1])
        if pack_mode:
            return pack_particles_host(
                x, y, hs, [mass, temp], box=BOX_MPC,
                field_scales=(MASS_SCALE, TEMP_SCALE),
            )
        return (x, y, hs, mass, temp)

    def to_device(host):
        import dataclasses

        if pack_mode:
            put = jax.device_put
            return dataclasses.replace(
                host,
                x_q=None if host.x_q is None else put(host.x_q),
                y_q=None if host.y_q is None else put(host.y_q),
                h_q=put(host.h_q),
                fields_q=put(host.fields_q),
                pos_delta=None if host.pos_delta is None else (
                    put(host.pos_delta[0]), put(host.pos_delta[1]),
                    put(host.pos_delta[2]), put(host.pos_delta[3]),
                    host.pos_delta[4],
                ),
                field_log_meta=None if host.field_log_meta is None else (
                    put(host.field_log_meta[0]), put(host.field_log_meta[1]),
                ),
            )
        return jax.tree_util.tree_map(jax.device_put, host)

    bytes_per_particle = [0.0]

    def run_pass():
        t_pass = time.perf_counter()
        wait_s = tile_s = deposit_s = 0.0
        total = None
        # stream_macro_chunks runs read + unit conversion + the H2D put of
        # chunk k+1 on a background thread while chunk k sorts/deposits on
        # the device — the dominant tunnel transfer no longer serializes
        # with compute (VERDICT r2 item 3; prefetch_depth=1 bounds resident
        # chunks, HBM holds at most two working sets)
        stream = stream_macro_chunks(
            read_chunk, n_chunks, prefetch_depth=1, to_device=to_device,
            n_readers=n_readers,
        )
        for ci, item in enumerate(stream):
            if pack_mode:
                bytes_per_particle[0] = item.nbytes / item.n_particles
                x_d, y_d, hs_d, fields_d = unpack_particles_device(item)
                mass_d, temp_d = fields_d[0], fields_d[1]
            else:
                x_d, y_d, hs_d, mass_d, temp_d = item
                bytes_per_particle[0] = 20.0
            t0 = time.perf_counter()
            # payload algebra on device: the host's single core is the
            # scarce resource at this scale
            values = jnp.stack([mass_d, mass_d * temp_d], axis=0)
            jax.block_until_ready((x_d, y_d, hs_d, values))
            wait_s += time.perf_counter() - t0

            if engine == "coherent":
                from astro_sph_tools_tpu.ops.deposit_coherent import (
                    deposit_2d_coherent,
                )

                t0 = time.perf_counter()
                maps = deposit_2d_coherent(
                    x_d, y_d, hs_d, values, spec, precision="bf16x2"
                )
                total = maps if total is None else total + maps
                jax.block_until_ready(total)
                deposit_s += time.perf_counter() - t0
            else:
                t0 = time.perf_counter()
                tp = tile_particles(
                    x_d, y_d, hs_d, values, spec, need_perm=False
                )
                jax.block_until_ready(tp.sorted_u)
                tile_s += time.perf_counter() - t0

                t0 = time.perf_counter()
                maps = deposit_tiled(tp, precision="bf16x2")
                total = maps if total is None else total + maps
                jax.block_until_ready(total)
                deposit_s += time.perf_counter() - t0
            print(
                f"  chunk {ci + 1}/{n_chunks}: wait {wait_s:.2f}s tile {tile_s:.2f}s "
                f"deposit {deposit_s:.2f}s (cumulative)",
                flush=True,
            )
        return total, time.perf_counter() - t_pass, wait_s, tile_s, deposit_s

    # pass 1 pays the axon per-process program-preparation cost (minutes for
    # the big sort executable, regardless of the persistent compile cache);
    # pass 2 is the steady-state wall-clock a resident service would see
    total, cold_wall, *_ = run_pass()
    total, wall, io_s, tile_s, deposit_s = run_pass()  # io_s = exposed wait

    sigma = np.asarray(total[0])
    mwt = np.asarray(total[1])
    mean_t = np.where(sigma > 0, mwt / np.maximum(sigma, 1e-30), 0.0)
    assert np.isfinite(sigma).all() and np.isfinite(mean_t).all()

    print(
        json.dumps(
            {
                "metric": "e2e snapshot->1024^2 2-field adaptive-h map stack wall-clock (steady)",
                "value": round(wall, 2),
                "unit": "seconds",
                "n_particles": n_gas,
                "particles_per_sec": round(n_gas / wall, 1),
                "cold_start_s": round(cold_wall, 2),
                "wire_format": wire,
                "n_readers": n_readers,
                "engine": engine,
                "bytes_per_particle": round(bytes_per_particle[0], 2),
                "phases_s": {
                    "io": round(io_s, 2),
                    "tile_sort": round(tile_s, 2),
                    "deposit": round(deposit_s, 2),
                },
                "backend": jax.default_backend(),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
