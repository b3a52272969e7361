/* FFTW-compatible shim: 2-D DCT-II/DCT-III via cosine-matrix products.
 *
 * Built together with the reference BFM sources (read from
 * /root/reference, never vendored) to produce a parity oracle binary;
 * see tests/test_bfm_oracle.py. O(n^2) per 1-D transform is plenty for
 * test gathers, and double-precision accumulation keeps the shim's
 * rounding well below the float32 solver's own noise floor.
 */
#define _USE_MATH_DEFINES
#include <math.h>
#include <stdlib.h>

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

#include "fftw3.h"

struct fftwf_plan_s {
    int n0, n1;
    fftw_r2r_kind kind;
    float *in;
    float *out;
    double *cos0;   /* (n0 x n0) table: cos(pi*(j+0.5)*k/n0) [k*n0+j] */
    double *cos1;   /* (n1 x n1) table */
    double *work;   /* n0*n1 doubles */
};

static double *cos_table(int n)
{
    double *t = (double *)malloc(sizeof(double) * (size_t)n * n);
    for (int k = 0; k < n; ++k)
        for (int j = 0; j < n; ++j)
            t[(size_t)k * n + j] = cos(M_PI * (j + 0.5) * k / n);
    return t;
}

fftwf_plan fftwf_plan_r2r_2d(int n0, int n1, float *in, float *out,
                             fftw_r2r_kind kind0, fftw_r2r_kind kind1,
                             unsigned flags)
{
    (void)flags;
    if (kind0 != kind1)
        return NULL;
    fftwf_plan p = (fftwf_plan)malloc(sizeof(struct fftwf_plan_s));
    p->n0 = n0;
    p->n1 = n1;
    p->kind = kind0;
    p->in = in;
    p->out = out;
    p->cos0 = cos_table(n0);
    p->cos1 = cos_table(n1);
    p->work = (double *)malloc(sizeof(double) * (size_t)n0 * n1);
    return p;
}

/* y[k] = 2 * sum_j x[j*stride] * cos(pi*(j+0.5)*k/n)  (REDFT10);
 * x is strided, y is contiguous scratch. */
static void dct2_line(const double *x, double *y, int n, int stride,
                      const double *tab)
{
    for (int k = 0; k < n; ++k) {
        const double *row = tab + (size_t)k * n;
        double acc = 0.0;
        for (int j = 0; j < n; ++j)
            acc += x[(size_t)j * stride] * row[j];
        y[k] = 2.0 * acc;
    }
}

/* y[k] = x[0] + 2 * sum_{j>=1} x[j*stride] * cos(pi*j*(k+0.5)/n)
 * (REDFT01); cos(pi*j*(k+0.5)/n) = tab[j*n+k], the DCT-II transpose.
 * x is strided, y is contiguous scratch. */
static void dct3_line(const double *x, double *y, int n, int stride,
                      const double *tab)
{
    for (int k = 0; k < n; ++k) {
        double acc = x[0];
        for (int j = 1; j < n; ++j)
            acc += 2.0 * x[(size_t)j * stride] * tab[(size_t)j * n + k];
        y[k] = acc;
    }
}

void fftwf_execute(const fftwf_plan p)
{
    const int n0 = p->n0, n1 = p->n1;
    const size_t total = (size_t)n0 * n1;
    double *a = p->work;
    double *line = (double *)malloc(sizeof(double) *
                                    (size_t)(n0 > n1 ? n0 : n1));
    for (size_t i = 0; i < total; ++i)
        a[i] = (double)p->in[i];

    /* dim1: contiguous rows of length n1 */
    for (int i = 0; i < n0; ++i) {
        double *row = a + (size_t)i * n1;
        if (p->kind == FFTW_REDFT10)
            dct2_line(row, line, n1, 1, p->cos1);
        else
            dct3_line(row, line, n1, 1, p->cos1);
        for (int j = 0; j < n1; ++j)
            row[j] = line[j];
    }
    /* dim0: strided columns of length n0 */
    for (int j = 0; j < n1; ++j) {
        double *col = a + j;
        if (p->kind == FFTW_REDFT10)
            dct2_line(col, line, n0, n1, p->cos0);
        else
            dct3_line(col, line, n0, n1, p->cos0);
        for (int i = 0; i < n0; ++i)
            col[(size_t)i * n1] = line[i];
    }
    for (size_t i = 0; i < total; ++i)
        p->out[i] = (float)a[i];
    free(line);
}

void fftwf_destroy_plan(fftwf_plan p)
{
    if (!p)
        return;
    free(p->cos0);
    free(p->cos1);
    free(p->work);
    free(p);
}
