/* Parity driver for the flappie compute chain (no fast5/HDF5 dependency).
 *
 * Feeds raw float32 samples through the exact pipeline flappie's
 * calculate_post runs after fast5 reading (flappie/src/flappie.c:235-305):
 * medmad normalize -> flipflop_transitions -> transpost_crf_flipflop
 * -> decode_crf_flipflop + change_positions. Dumps every intermediate so
 * the JAX rebuild can be compared tensor-for-tensor against the reference
 * implementation with synthetic weights (the pretrained .mdl blobs are
 * git-LFS pointers in this environment).
 *
 * Usage: parity_main <raw.f32> <out_prefix> [temperature]
 * Writes: <p>.trans.f32 (nparam x nblock col-major, like the matrix dump),
 *         <p>.post.f32 (the .post payload, as flappie.c:267-272),
 *         <p>.path.i32, <p>.chpos.i32, <p>.score.f32, <p>.norm.f32
 */
#include <stdio.h>
#include <stdlib.h>

#include "decode.h"
#include "flappie_matrix.h"
#include "flappie_structures.h"
#include "layers.h"
#include "networks.h"
#include "nnfeatures.h"
#include "util.h"

/* weight matrices from the generated model header (linked via networks.c) */
#define M(n) _##n##_rnnrf_flipflop_r941native_##W
extern _Mat _conv_rnnrf_flipflop_r941native_W;
extern _Mat _conv_rnnrf_flipflop_r941native_b;
extern _Mat _gruB1_rnnrf_flipflop_r941native_iW;
extern _Mat _gruB1_rnnrf_flipflop_r941native_sW;
extern _Mat _gruB1_rnnrf_flipflop_r941native_b;
extern _Mat _gruF2_rnnrf_flipflop_r941native_iW;
extern _Mat _gruF2_rnnrf_flipflop_r941native_sW;
extern _Mat _gruF2_rnnrf_flipflop_r941native_b;
extern _Mat _gruB3_rnnrf_flipflop_r941native_iW;
extern _Mat _gruB3_rnnrf_flipflop_r941native_sW;
extern _Mat _gruB3_rnnrf_flipflop_r941native_b;
extern _Mat _gruF4_rnnrf_flipflop_r941native_iW;
extern _Mat _gruF4_rnnrf_flipflop_r941native_sW;
extern _Mat _gruF4_rnnrf_flipflop_r941native_b;
extern _Mat _gruB5_rnnrf_flipflop_r941native_iW;
extern _Mat _gruB5_rnnrf_flipflop_r941native_sW;
extern _Mat _gruB5_rnnrf_flipflop_r941native_b;
extern _Mat _FF_rnnrf_flipflop_r941native_W;
extern _Mat _FF_rnnrf_flipflop_r941native_b;
#define CONV_STRIDE 2

static void write_mat(const char *prefix, const char *suffix,
                      const_flappie_matrix m) {
    char name[4096];
    snprintf(name, sizeof(name), "%s.%s", prefix, suffix);
    FILE *f = fopen(name, "wb");
    float *arr = array_from_flappie_matrix(m);
    fwrite(arr, sizeof(float), m->nr * m->nc, f);
    free(arr);
    fclose(f);
}

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s raw.f32 out_prefix [temperature]\n",
                argv[0]);
        return 2;
    }
    FILE *f = fopen(argv[1], "rb");
    if (!f) { perror("raw"); return 2; }
    fseek(f, 0, SEEK_END);
    long nbytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    size_t n = (size_t)nbytes / sizeof(float);
    float *raw = malloc(n * sizeof(float));
    if (fread(raw, sizeof(float), n, f) != n) { return 2; }
    fclose(f);
    float temperature = (argc > 3) ? (float)atof(argv[3]) : 1.0f;

    raw_table rt = {NULL, n, 0, n, raw};
    medmad_normalise_array(rt.raw, rt.n);

    char name[4096];
    snprintf(name, sizeof(name), "%s.norm.f32", argv[2]);
    f = fopen(name, "wb");
    fwrite(rt.raw, sizeof(float), n, f);
    fclose(f);

    /* stage-by-stage dumps (mirrors flipflop_guppy_transitions,
     * networks.c:301-340) for tensor-level localization */
    {
        flappie_matrix raw_mat = features_from_raw(rt);
        flappie_matrix conv = convolution(
            raw_mat, &_conv_rnnrf_flipflop_r941native_W,
            &_conv_rnnrf_flipflop_r941native_b, CONV_STRIDE, NULL);
        tanh_activation_inplace(conv);
        write_mat(argv[2], "conv.f32", conv);
        flappie_matrix in1 = feedforward_linear(
            conv, &_gruB1_rnnrf_flipflop_r941native_iW,
            &_gruB1_rnnrf_flipflop_r941native_b, NULL);
        flappie_matrix g1 = grumod_backward(
            in1, &_gruB1_rnnrf_flipflop_r941native_sW, NULL);
        write_mat(argv[2], "gru1.f32", g1);
        flappie_matrix in2 = feedforward_linear(
            g1, &_gruF2_rnnrf_flipflop_r941native_iW,
            &_gruF2_rnnrf_flipflop_r941native_b, NULL);
        flappie_matrix g2 = grumod_forward(
            in2, &_gruF2_rnnrf_flipflop_r941native_sW, NULL);
        write_mat(argv[2], "gru2.f32", g2);
        flappie_matrix in3 = feedforward_linear(
            g2, &_gruB3_rnnrf_flipflop_r941native_iW,
            &_gruB3_rnnrf_flipflop_r941native_b, NULL);
        flappie_matrix g3 = grumod_backward(
            in3, &_gruB3_rnnrf_flipflop_r941native_sW, NULL);
        write_mat(argv[2], "gru3.f32", g3);
        flappie_matrix in4 = feedforward_linear(
            g3, &_gruF4_rnnrf_flipflop_r941native_iW,
            &_gruF4_rnnrf_flipflop_r941native_b, NULL);
        flappie_matrix g4 = grumod_forward(
            in4, &_gruF4_rnnrf_flipflop_r941native_sW, NULL);
        write_mat(argv[2], "gru4.f32", g4);
        flappie_matrix in5 = feedforward_linear(
            g4, &_gruB5_rnnrf_flipflop_r941native_iW,
            &_gruB5_rnnrf_flipflop_r941native_b, NULL);
        flappie_matrix g5 = grumod_backward(
            in5, &_gruB5_rnnrf_flipflop_r941native_sW, NULL);
        write_mat(argv[2], "gru5.f32", g5);
        flappie_matrix ff = globalnorm_flipflop(
            g5, &_FF_rnnrf_flipflop_r941native_W,
            &_FF_rnnrf_flipflop_r941native_b, temperature, NULL);
        write_mat(argv[2], "ff.f32", ff);
        free_flappie_matrix(raw_mat);
        free_flappie_matrix(conv);
        free_flappie_matrix(in1);
        free_flappie_matrix(g1);
        free_flappie_matrix(in2);
        free_flappie_matrix(g2);
        free_flappie_matrix(in3);
        free_flappie_matrix(g3);
        free_flappie_matrix(in4);
        free_flappie_matrix(g4);
        free_flappie_matrix(in5);
        free_flappie_matrix(g5);
        free_flappie_matrix(ff);
    }

    flappie_matrix trans =
        flipflop_transitions(rt, temperature, FLAPPIE_MODEL_R941_NATIVE);
    if (!trans) { fprintf(stderr, "transitions failed\n"); return 1; }
    write_mat(argv[2], "trans.f32", trans);

    flappie_matrix posterior = transpost_crf_flipflop(trans, true);
    write_mat(argv[2], "post.f32", posterior);

    const size_t nblock = posterior->nc;
    int *path = calloc(nblock + 2, sizeof(int));
    int *chpos = calloc(nblock + 2, sizeof(int));
    float *qpath = calloc(nblock + 2, sizeof(float));
    float score = decode_crf_flipflop(posterior, false, path, qpath);
    size_t nidx = change_positions(path, nblock, chpos);

    snprintf(name, sizeof(name), "%s.path.i32", argv[2]);
    f = fopen(name, "wb");
    fwrite(path, sizeof(int), nblock + 1, f);
    fclose(f);
    snprintf(name, sizeof(name), "%s.chpos.i32", argv[2]);
    f = fopen(name, "wb");
    fwrite(chpos, sizeof(int), nidx, f);
    fclose(f);
    snprintf(name, sizeof(name), "%s.score.f32", argv[2]);
    f = fopen(name, "wb");
    fwrite(&score, sizeof(float), 1, f);
    fclose(f);

    printf("ok n=%zu nblock=%zu nidx=%zu score=%f\n", n, nblock, nidx,
           (double)score);
    return 0;
}
