// Native host runtime for the TPU framework: visibility planning,
// binning and sorting on the ingest path.
//
// The device (TPU) executes the jitted gridding graphs; everything that
// is host-side bookkeeping over raw visibility metadata lives here so it
// runs at memory bandwidth with OpenMP instead of through the Python/JAX
// dispatch layer (whose per-op host<->device round-trips cost tens of
// milliseconds on tunnelled attachments).
//
// Reference equivalents:
//  - channel clamping: grid_data/sdp_gridder_clamp_channels.h:100-178
//  - uvw bounds:       grid_data/sdp_gridder_utils.cpp:682-720
//  - per-box counting: grid_data/sdp_grid_wstack_wtower.cpp:66-136
//  - bucket sort:      visibility/sdp_tiled_functions.cpp (GPU bucket
//    sort of visibilities into tile order)
//
// All functions use a plain C ABI for ctypes binding; arrays are caller
// allocated. Built with: g++ -O3 -fopenmp -shared -fPIC.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr double kC0 = 299792458.0;
constexpr double kIntGuard = 2147483645.0;

// Mirror of sdp_gridder_clamp_channels_inline (and the framework's
// _clamp_1d): clamp [start, end) so that min_u <= u0 + ch*du < max_u.
inline void clamp_1d(double u, double freq0_hz, double dfreq_hz,
                     double min_u, double max_u,
                     int64_t* start, int64_t* end)
{
    const double u0 = freq0_hz * u / kC0;
    const double du = dfreq_hz * u / kC0;
    const double eta =
        std::max(std::fabs(min_u - u0), std::fabs(max_u - u0)) / kIntGuard;
    if (du > eta)
    {
        *start = std::max(*start,
                          (int64_t)std::ceil((min_u - u0) / du));
        *end = std::min(*end, (int64_t)std::ceil((max_u - u0) / du));
    }
    else if (du < -eta)
    {
        *start = std::max(*start,
                          (int64_t)std::ceil((max_u - u0) / du));
        *end = std::min(*end, (int64_t)std::ceil((min_u - u0) / du));
    }
    else if (min_u > u0 || max_u <= u0)
    {
        *start = 0;
        *end = 0;
    }
    if (*end <= *start)
    {
        *start = 0;
        *end = 0;
    }
}

}  // namespace

extern "C" {

// Scaled (u,v,w) min/max over all rows and selected channels
// (sdp_gridder_uvw_bounds_all).
void sdp_tpu_uvw_bounds(const double* uvw, int64_t num_rows,
                        double freq0_hz, double dfreq_hz,
                        const int32_t* start_chs, const int32_t* end_chs,
                        double* uvw_min, double* uvw_max)
{
    for (int d = 0; d < 3; ++d)
    {
        uvw_min[d] = INFINITY;
        uvw_max[d] = -INFINITY;
    }
    for (int64_t r = 0; r < num_rows; ++r)
    {
        const int64_t s = start_chs[r], e = end_chs[r];
        if (s >= e) continue;
        for (int d = 0; d < 3; ++d)
        {
            const double c = uvw[3 * r + d];
            const double u0 = freq0_hz * c / kC0;
            const double du = dfreq_hz * c / kC0;
            const double a = u0 + (double)s * du;
            const double b = u0 + (double)(e - 1) * du;
            const double lo = c >= 0 ? a : b;
            const double hi = c >= 0 ? b : a;
            uvw_min[d] = std::min(uvw_min[d], lo);
            uvw_max[d] = std::max(uvw_max[d], hi);
        }
    }
}

// One-pass w-stacking task planner: for every (iw, iu, iv) box, count
// the selected visibilities and track the scaled-w bounds of the
// selection. Replaces the per-box clamp+count loop of the Python
// planner (and of sdp_grid_wstack_wtower.cpp:66-136) with a single
// OpenMP pass over rows.
//
// counts / wmin / wmax are [n_iw * n_iu * n_iv], C order (iw, iu, iv).
void sdp_tpu_plan_wstack(const double* uvw, int64_t num_rows,
                         double freq0_hz, double dfreq_hz,
                         int64_t num_chan,
                         double eff_sg_dist, double w_stack_dist,
                         int64_t min_iu, int64_t n_iu,
                         int64_t min_iv, int64_t n_iv,
                         int64_t min_iw, int64_t n_iw,
                         int64_t* counts, double* wmin, double* wmax)
{
    const int64_t n_boxes = n_iw * n_iu * n_iv;
    for (int64_t i = 0; i < n_boxes; ++i)
    {
        counts[i] = 0;
        wmin[i] = INFINITY;
        wmax[i] = -INFINITY;
    }

#ifdef _OPENMP
    const int num_threads = omp_get_max_threads();
#else
    const int num_threads = 1;
#endif
    std::vector<std::vector<int64_t>> t_counts(
        num_threads, std::vector<int64_t>(n_boxes, 0));
    std::vector<std::vector<double>> t_wmin(
        num_threads, std::vector<double>(n_boxes, INFINITY));
    std::vector<std::vector<double>> t_wmax(
        num_threads, std::vector<double>(n_boxes, -INFINITY));

#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < num_rows; ++r)
    {
#ifdef _OPENMP
        const int tid = omp_get_thread_num();
#else
        const int tid = 0;
#endif
        const double u = uvw[3 * r + 0];
        const double v = uvw[3 * r + 1];
        const double w = uvw[3 * r + 2];
        for (int64_t jw = 0; jw < n_iw; ++jw)
        {
            const double min_w =
                (double)(min_iw + jw) * w_stack_dist - w_stack_dist / 2;
            const double max_w = min_w + w_stack_dist;
            int64_t s_w = 0, e_w = num_chan;
            clamp_1d(w, freq0_hz, dfreq_hz, min_w, max_w, &s_w, &e_w);
            if (s_w >= e_w) continue;
            for (int64_t ju = 0; ju < n_iu; ++ju)
            {
                const double min_u =
                    (double)(min_iu + ju) * eff_sg_dist - eff_sg_dist / 2;
                const double max_u = min_u + eff_sg_dist;
                int64_t s_u = s_w, e_u = e_w;
                clamp_1d(u, freq0_hz, dfreq_hz, min_u, max_u, &s_u, &e_u);
                if (s_u >= e_u) continue;
                for (int64_t jv = 0; jv < n_iv; ++jv)
                {
                    const double min_v =
                        (double)(min_iv + jv) * eff_sg_dist
                        - eff_sg_dist / 2;
                    const double max_v = min_v + eff_sg_dist;
                    int64_t s = s_u, e = e_u;
                    clamp_1d(v, freq0_hz, dfreq_hz, min_v, max_v, &s, &e);
                    if (s >= e) continue;
                    const int64_t box = (jw * n_iu + ju) * n_iv + jv;
                    t_counts[tid][box] += e - s;
                    // Scaled-w bounds of the selection at the channel
                    // endpoints (monotonic in channel).
                    const double w0 = freq0_hz * w / kC0;
                    const double dw = dfreq_hz * w / kC0;
                    const double a = w0 + (double)s * dw;
                    const double b = w0 + (double)(e - 1) * dw;
                    const double lo = std::min(a, b);
                    const double hi = std::max(a, b);
                    if (lo < t_wmin[tid][box]) t_wmin[tid][box] = lo;
                    if (hi > t_wmax[tid][box]) t_wmax[tid][box] = hi;
                }
            }
        }
    }
    for (int t = 0; t < num_threads; ++t)
        for (int64_t i = 0; i < n_boxes; ++i)
        {
            counts[i] += t_counts[t][i];
            wmin[i] = std::min(wmin[i], t_wmin[t][i]);
            wmax[i] = std::max(wmax[i], t_wmax[t][i]);
        }
}

// Stable argsort of rows by their w coordinate — the host-side bucket
// sort that gives the device kernels w-locality (the TPU analogue of
// sdp_tiled_functions' GPU bucket sort).
void sdp_tpu_sort_rows_by_w(const double* uvw, int64_t num_rows,
                            int64_t* perm)
{
    for (int64_t i = 0; i < num_rows; ++i) perm[i] = i;
    std::stable_sort(perm, perm + num_rows,
                     [&](int64_t a, int64_t b)
                     { return uvw[3 * a + 2] < uvw[3 * b + 2]; });
}

// Exclusive prefix sum (sdp_count_and_prefix_sum's second half).
void sdp_tpu_prefix_sum(const int64_t* counts, int64_t n,
                        int64_t* offsets)
{
    int64_t acc = 0;
    for (int64_t i = 0; i < n; ++i)
    {
        offsets[i] = acc;
        acc += counts[i];
    }
    offsets[n] = acc;
}

}  // extern "C"
