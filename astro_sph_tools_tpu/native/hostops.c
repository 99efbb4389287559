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

/* Morton-delta position encoding (io/packing.py), one streaming pass.
 *
 * Interleaves (x_q, y_q) into u32 Morton codes and emits per-4096-record
 * segments: int16 first differences (delta[0] of each segment = 0, the
 * u32 base carries the absolute code) plus a sparse exception list for
 * jumps outside int16. Exception entries store the CORRECTION the
 * decoder's segmented running sum must add from that record onward (see
 * morton_delta_encode's NumPy formulation — bit-identical outputs).
 */
static inline uint32_t spread16(uint32_t v) {
    v = (v | (v << 8)) & 0x00FF00FFu;
    v = (v | (v << 4)) & 0x0F0F0F0Fu;
    v = (v | (v << 2)) & 0x33333333u;
    v = (v | (v << 1)) & 0x55555555u;
    return v;
}

void morton_delta_encode_u16(
    const uint16_t *xq, const uint16_t *yq, int64_t n, int64_t seg,
    int16_t *deltas, uint32_t *bases, int64_t *exc_idx, uint32_t *exc_corr,
    int64_t *n_exc_out)
{
    int64_t n_seg = (n + seg - 1) / seg;
    int64_t ne = 0;
    uint32_t m_prev = 0, m0 = 0;
    uint32_t cum_corr = 0;
    uint32_t m_last = 0; /* edge-padding: repeat the final record's code */
    for (int64_t s = 0; s < n_seg; s++) {
        int64_t i0 = s * seg;
        cum_corr = 0;
        for (int64_t j = 0; j < seg; j++) {
            int64_t i = i0 + j;
            uint32_t m;
            if (i < n) {
                m = spread16(xq[i]) | (spread16(yq[i]) << 1);
                m_last = m;
            } else {
                m = m_last; /* np.pad(..., mode="edge") parity */
            }
            if (j == 0) {
                bases[s] = m;
                deltas[i0] = 0;
                m0 = m;
            } else {
                int64_t d = (int64_t)m - (int64_t)m_prev;
                if (d >= -32768 && d <= 32767) {
                    deltas[i0 + j] = (int16_t)d;
                    m0 += (uint32_t)(int32_t)d;
                } else {
                    deltas[i0 + j] = 0;
                    uint32_t corr = m - (m0 + cum_corr);
                    exc_idx[ne] = i0 + j;
                    exc_corr[ne] = corr;
                    ne++;
                    cum_corr += corr;
                }
            }
            m_prev = m;
        }
    }
    *n_exc_out = ne;
}
