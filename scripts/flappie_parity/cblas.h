/* Minimal CBLAS declarations for building the flappie parity harness.
 *
 * The environment ships libblas.so.3 (which exports the cblas_ symbols)
 * but no cblas.h; flappie only calls cblas_sgemm and cblas_sgemv
 * (layers.c, flappie_matrix.c). Standard CBLAS ABI.
 */
#ifndef PARITY_CBLAS_H
#define PARITY_CBLAS_H

enum CBLAS_ORDER { CblasRowMajor = 101, CblasColMajor = 102 };
enum CBLAS_TRANSPOSE { CblasNoTrans = 111, CblasTrans = 112,
                       CblasConjTrans = 113 };

void cblas_sgemm(const enum CBLAS_ORDER Order,
                 const enum CBLAS_TRANSPOSE TransA,
                 const enum CBLAS_TRANSPOSE TransB, const int M, const int N,
                 const int K, const float alpha, const float *A,
                 const int lda, const float *B, const int ldb,
                 const float beta, float *C, const int ldc);

void cblas_sgemv(const enum CBLAS_ORDER Order,
                 const enum CBLAS_TRANSPOSE TransA, const int M, const int N,
                 const float alpha, const float *A, const int lda,
                 const float *X, const int incX, const float beta, float *Y,
                 const int incY);

#endif
