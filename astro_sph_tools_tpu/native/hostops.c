/* Native host-side staging kernels for astro_sph_tools_tpu.
 *
 * The TPU compute path is JAX/Pallas; these C kernels cover the host side of
 * the ingest pipeline — the role pyread_eagle's C extension plays for the
 * reference (`/root/reference/src/astro_sph_tools/io/EAGLE/_SnapshotEAGLE.py:115`).
 * The hot function is the fused (footprint level, tile id, tile-local f32
 * coordinate) assignment consumed by the Pallas deposit's host-f64 quality
 * path (`ops/deposit_pallas.py::tile_particles`): the NumPy formulation walks
 * ~10 full passes over 1e8-row f64 arrays on a single weak core; this does
 * one pass, bit-identical to the NumPy semantics (truncating int casts,
 * np.mod sign convention, clip bounds).
 *
 * Built on demand with `cc -O3 -shared -fPIC` (no external dependencies) and
 * loaded via ctypes; every caller falls back to the NumPy path when the
 * toolchain is unavailable.
 */

#include <stdint.h>

/* np.mod semantics: result carries the divisor's sign, in [0, m). */
static inline double pymod(double a, double m) {
    double r = a - (double)((int64_t)(a / m)) * m; /* fmod by truncation */
    /* match fmod for the magnitudes used here; adjust into [0, m) */
    if (r < 0.0) r += m;
    if (r >= m) r -= m; /* guard the r == m rounding corner */
    return r;
}

static inline int32_t clip_i32(int32_t v, int32_t lo, int32_t hi) {
    if (v < lo) return lo;
    if (v > hi) return hi;
    return v;
}

/* Fused multi-level tile assignment (one pass over the particles).
 *
 * Inputs
 *   x, y      : (n,) f64 world coordinates
 *   h         : (n,) f32 smoothing lengths
 *   n         : particle count
 *   x0,y0     : extent origin
 *   psx,psy   : pixel sizes
 *   nx,ny     : map shape (pixels)
 *   periodic  : wrap u/v into [0, nx/ny)
 *   sfac      : kernel support factor (support = sfac * h)
 *   n_levels  : number of footprint levels
 *   bounds    : (n_levels,) max s_pix per level, < 0 for a disabled level
 *   ntx,nty   : (n_levels,) tile counts
 *   tw,th     : (n_levels,) tile output width/height in pixels
 *   marg      : (n_levels,) margin M per level
 *   stride    : composite key stride (key = level * stride + tile)
 * Outputs
 *   key       : (n,) i32 composite sort key
 *   u_loc,v_loc : (n,) f32 tile-local pixel coordinates (global pixel
 *                 coordinates for oversize particles, matching the NumPy
 *                 fallback-path convention)
 */
void assign_tiles_f64(
    const double *x, const double *y, const float *h, int64_t n,
    double x0, double y0, double psx, double psy,
    int64_t nx, int64_t ny, int32_t periodic, double sfac,
    int32_t n_levels, const double *bounds,
    const int32_t *ntx, const int32_t *nty,
    const int32_t *tw, const int32_t *th, const int32_t *marg,
    int64_t stride,
    int32_t *key, float *u_loc, float *v_loc)
{
    const double inv_psx = 1.0 / psx;
    const double inv_psy = 1.0 / psy;
    const double ps_min = psx < psy ? psx : psy;
    for (int64_t i = 0; i < n; i++) {
        double u = (x[i] - x0) * inv_psx;
        double v = (y[i] - y0) * inv_psy;
        if (periodic) {
            u = pymod(u, (double)nx);
            v = pymod(v, (double)ny);
        }
        /* same operation order as the NumPy fallback ((sfac * h) / ps_min):
         * a different rounding order can flip the level assignment at an
         * exact level-bound value */
        double s_pix = (sfac * (double)h[i]) / ps_min;
        int32_t level = n_levels;
        for (int32_t l = 0; l < n_levels; l++) {
            if (bounds[l] >= 0.0 && s_pix <= bounds[l]) { level = l; break; }
        }
        if (level < n_levels) {
            /* clamp the double quotient BEFORE the integer cast: a far
             * out-of-extent non-periodic particle can push u/tw beyond
             * int32 range, where the cast is undefined behavior in C
             * (NumPy's .astype(int32) wraps deterministically; both are
             * clipped into range, so clamping first is equivalent for
             * every in-extent particle and well-defined for the rest) */
            double qu = u / (double)tw[level];
            double qv = v / (double)th[level];
            if (qu < 0.0) qu = 0.0;
            if (qu > (double)(ntx[level] - 1)) qu = (double)(ntx[level] - 1);
            if (qv < 0.0) qv = 0.0;
            if (qv > (double)(nty[level] - 1)) qv = (double)(nty[level] - 1);
            int32_t ti = (int32_t)qu;
            int32_t tj = (int32_t)qv;
            key[i] = (int32_t)((int64_t)level * stride + (int64_t)tj * ntx[level] + ti);
            u_loc[i] = (float)(u - (double)(ti * tw[level] - marg[level]));
            v_loc[i] = (float)(v - (double)(tj * th[level] - marg[level]));
        } else {
            /* oversize: global pixel coordinates for the dense fallback */
            key[i] = (int32_t)((int64_t)n_levels * stride);
            u_loc[i] = (float)u;
            v_loc[i] = (float)v;
        }
    }
}

/* Fused scale-and-cast: out[i] = (float)(src[i] * scale), one pass. */
void scale_cast_f64(const double *src, int64_t n, double scale, float *out) {
    for (int64_t i = 0; i < n; i++) out[i] = (float)(src[i] * scale);
}

void scale_cast_f32(const float *src, int64_t n, double scale, float *out) {
    for (int64_t i = 0; i < n; i++) out[i] = (float)((double)src[i] * scale);
}
