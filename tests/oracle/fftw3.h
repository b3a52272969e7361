/* Minimal FFTW-compatible shim header for building the reference BFM C
 * solver as a test oracle on machines without libfftw3f.
 *
 * Implements exactly the API subset the reference uses
 * (fot2d.c:27-45,466-473): in-place 2-D real-to-real plans with both
 * kinds REDFT10 (DCT-II) or both REDFT01 (DCT-III), executed via
 * cosine-matrix multiplication in double precision. FFTW's unnormalized
 * transform conventions are matched:
 *   REDFT10: Y[k] = 2 * sum_j X[j] cos(pi*(j+1/2)*k/n)
 *   REDFT01: Y[k] = X[0] + 2 * sum_{j>=1} X[j] cos(pi*j*(k+1/2)/n)
 * This is original shim code (not derived from FFTW or the reference).
 */
#ifndef FFTW_SHIM_H
#define FFTW_SHIM_H

#ifdef __cplusplus
extern "C" {
#endif

typedef enum {
    FFTW_REDFT10 = 5,
    FFTW_REDFT01 = 6
} fftw_r2r_kind;

#define FFTW_MEASURE 0u
#define FFTW_ESTIMATE 64u

typedef struct fftwf_plan_s *fftwf_plan;

fftwf_plan fftwf_plan_r2r_2d(int n0, int n1, float *in, float *out,
                             fftw_r2r_kind kind0, fftw_r2r_kind kind1,
                             unsigned flags);
void fftwf_execute(const fftwf_plan plan);
void fftwf_destroy_plan(fftwf_plan plan);

#ifdef __cplusplus
}
#endif

#endif /* FFTW_SHIM_H */
