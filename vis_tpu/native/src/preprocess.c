/* Fused image preprocessing: bicubic resize + CLIP normalize + Qwen2-VL
 * patchify in one cache-friendly native pass.
 *
 * The host-side hot path feeding the TPU (SURVEY.md §7 step 4; the
 * reference's equivalent hot loop was PIL thumbnail + base64 encode,
 * reference vlm_inspector.py:46-88).  Python orchestration keeps PIL for
 * decode (libjpeg), then hands the decoded RGB buffer here; this pass
 * replaces three separate numpy passes (resize, normalize, reshape/
 * transpose) and their intermediate allocations.
 *
 * Exposed via the CPython C API (no pybind11 in this environment):
 *   _vis_native.resize_normalize_patchify(
 *       src_bytes, src_h, src_w, dst_h, dst_w,
 *       mean3_tuple, std3_tuple, temporal, patch, merge) -> bytes (f32)
 * returning the flattened [grid_h*grid_w, C*T*P*P] patch matrix.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#ifdef _OPENMP
#include <omp.h>
#endif

/* Catmull-Rom-style cubic kernel with a = -0.5 (PIL/OpenCV bicubic). */
static inline float cubic_weight(float x) {
    const float a = -0.5f;
    x = fabsf(x);
    if (x < 1.0f) {
        return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
    } else if (x < 2.0f) {
        return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
    }
    return 0.0f;
}

static inline int clampi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

/* Precompute PIL-style support-scaled filter taps for one axis.
 * On downscale the kernel support widens by the scale factor (area-aware
 * filtering, matching PIL's resample), and weights are normalized.
 * Returns tap bounds/weights; *max_taps is the per-pixel stride of weights. */
static int compute_taps(
    int src_size, int dst_size,
    int **bounds_out, float **weights_out, int *max_taps_out)
{
    const double scale = (double)src_size / (double)dst_size;
    const double filterscale = scale > 1.0 ? scale : 1.0;
    const double support = 2.0 * filterscale;  /* bicubic support = 2 */
    const int max_taps = (int)ceil(support) * 2 + 1;

    int *bounds = (int *)malloc(sizeof(int) * 2 * dst_size);
    float *weights = (float *)malloc(sizeof(float) * (size_t)max_taps * dst_size);
    if (bounds == NULL || weights == NULL) {
        free(bounds); free(weights);
        return -1;  /* caller raises MemoryError instead of a segfault */
    }

    for (int o = 0; o < dst_size; o++) {
        double center = ((double)o + 0.5) * scale;
        int lo = (int)floor(center - support);
        if (lo < 0) lo = 0;
        int hi = (int)ceil(center + support);
        if (hi > src_size) hi = src_size;
        int n = hi - lo;
        if (n > max_taps) n = max_taps;
        double total = 0.0;
        float *w = weights + (size_t)o * max_taps;
        for (int i = 0; i < n; i++) {
            double x = ((double)(lo + i) + 0.5 - center) / filterscale;
            double ww = (double)cubic_weight((float)x);
            w[i] = (float)ww;
            total += ww;
        }
        if (total != 0.0) {
            for (int i = 0; i < n; i++) w[i] = (float)(w[i] / total);
        }
        bounds[o * 2] = lo;
        bounds[o * 2 + 1] = n;
    }
    *bounds_out = bounds;
    *weights_out = weights;
    *max_taps_out = max_taps;
    return 0;
}

/* Separable PIL-parity bicubic resample of interleaved RGB u8 into a planar
 * f32 [3, dst_h, dst_w] buffer with per-channel normalization.  Horizontal
 * pass keeps float precision (PIL quantizes to u8 between passes; we stay
 * within ~1/255 of it with better accuracy). */
static int resize_normalize(
    const uint8_t *src, int src_h, int src_w,
    float *dst, int dst_h, int dst_w,
    const float *mean, const float *stdv)
{
    int *xb = NULL, *yb = NULL, x_taps, y_taps;
    float *xw = NULL, *yw = NULL;
    if (compute_taps(src_w, dst_w, &xb, &xw, &x_taps) != 0) return -1;
    if (compute_taps(src_h, dst_h, &yb, &yw, &y_taps) != 0) {
        free(xb); free(xw);
        return -1;
    }

    /* Horizontal pass: [src_h, dst_w, 3] float. */
    float *tmp = (float *)malloc(sizeof(float) * (size_t)src_h * dst_w * 3);
    if (tmp == NULL) {
        free(xb); free(xw); free(yb); free(yw);
        return -1;
    }
    #pragma omp parallel for schedule(static)
    for (int y = 0; y < src_h; y++) {
        const uint8_t *row = src + (size_t)y * src_w * 3;
        float *orow = tmp + (size_t)y * dst_w * 3;
        for (int ox = 0; ox < dst_w; ox++) {
            int lo = xb[ox * 2], n = xb[ox * 2 + 1];
            const float *w = xw + (size_t)ox * x_taps;
            float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f;
            for (int i = 0; i < n; i++) {
                const uint8_t *px = row + (size_t)(lo + i) * 3;
                acc0 += w[i] * (float)px[0];
                acc1 += w[i] * (float)px[1];
                acc2 += w[i] * (float)px[2];
            }
            orow[ox * 3] = acc0;
            orow[ox * 3 + 1] = acc1;
            orow[ox * 3 + 2] = acc2;
        }
    }

    /* Vertical pass + normalize into planar output. */
    const float inv255 = 1.0f / 255.0f;
    #pragma omp parallel for schedule(static)
    for (int oy = 0; oy < dst_h; oy++) {
        int lo = yb[oy * 2], n = yb[oy * 2 + 1];
        const float *w = yw + (size_t)oy * y_taps;
        for (int ox = 0; ox < dst_w; ox++) {
            float acc[3] = {0.f, 0.f, 0.f};
            for (int i = 0; i < n; i++) {
                const float *px = tmp + ((size_t)(lo + i) * dst_w + ox) * 3;
                acc[0] += w[i] * px[0];
                acc[1] += w[i] * px[1];
                acc[2] += w[i] * px[2];
            }
            for (int c = 0; c < 3; c++) {
                float v = acc[c];
                /* PIL clamps to the u8 range at output. */
                if (v < 0.f) v = 0.f;
                if (v > 255.f) v = 255.f;
                v *= inv255;
                dst[((size_t)c * dst_h + oy) * dst_w + ox] =
                    (v - mean[c]) / stdv[c];
            }
        }
    }
    free(tmp);
    free(xb); free(xw); free(yb); free(yw);
    return 0;
}

/* Rearrange planar [3, H, W] into Qwen2-VL merge-window patch rows:
 * out[grid_h*grid_w, 3*T*P*P] with the (gh/m, gw/m, m, m) ordering and the
 * temporal dimension replicated T times. */
static void patchify(
    const float *img, int dst_h, int dst_w,
    float *out, int temporal, int patch, int merge)
{
    const int grid_h = dst_h / patch;
    const int grid_w = dst_w / patch;
    const int row_len = 3 * temporal * patch * patch;
    int out_row = 0;
    for (int bh = 0; bh < grid_h / merge; bh++) {
        for (int bw = 0; bw < grid_w / merge; bw++) {
            for (int mh = 0; mh < merge; mh++) {
                for (int mw = 0; mw < merge; mw++) {
                    int gy = bh * merge + mh;
                    int gx = bw * merge + mw;
                    float *row_out = out + (size_t)out_row * row_len;
                    int k = 0;
                    for (int c = 0; c < 3; c++) {
                        const float *plane =
                            img + (size_t)c * dst_h * dst_w;
                        /* temporal replication: same frame T times */
                        for (int t = 0; t < temporal; t++) {
                            for (int py = 0; py < patch; py++) {
                                const float *line = plane +
                                    (size_t)(gy * patch + py) * dst_w +
                                    (size_t)gx * patch;
                                memcpy(&row_out[k], line,
                                       sizeof(float) * patch);
                                k += patch;
                            }
                        }
                    }
                    out_row++;
                }
            }
        }
    }
}

static PyObject *py_resize_normalize_patchify(PyObject *self, PyObject *args)
{
    Py_buffer src;
    int src_h, src_w, dst_h, dst_w, temporal, patch, merge;
    PyObject *mean_obj, *std_obj;
    if (!PyArg_ParseTuple(args, "y*iiiiOOiii", &src, &src_h, &src_w,
                          &dst_h, &dst_w, &mean_obj, &std_obj,
                          &temporal, &patch, &merge)) {
        return NULL;
    }
    if ((Py_ssize_t)src_h * src_w * 3 != src.len) {
        PyBuffer_Release(&src);
        PyErr_SetString(PyExc_ValueError, "src buffer size mismatch");
        return NULL;
    }
    /* Positivity first: patch*merge==0 would SIGFPE in the modulo below,
     * taking the interpreter down instead of raising. */
    if (temporal < 1 || patch < 1 || merge < 1 || dst_h < 1 || dst_w < 1 ||
        src_h < 1 || src_w < 1) {
        PyBuffer_Release(&src);
        PyErr_SetString(PyExc_ValueError,
                        "temporal/patch/merge and all dims must be >= 1");
        return NULL;
    }
    if (dst_h % (patch * merge) || dst_w % (patch * merge)) {
        PyBuffer_Release(&src);
        PyErr_SetString(PyExc_ValueError,
                        "dst dims must be multiples of patch*merge");
        return NULL;
    }
    float mean[3], stdv[3];
    for (int i = 0; i < 3; i++) {
        /* PySequence_GetItem returns NEW references: decref them or the
         * hot path leaks six float objects per preprocessed frame. */
        PyObject *m_item = PySequence_GetItem(mean_obj, i);
        PyObject *s_item = PySequence_GetItem(std_obj, i);
        mean[i] = m_item ? (float)PyFloat_AsDouble(m_item) : 0.f;
        stdv[i] = s_item ? (float)PyFloat_AsDouble(s_item) : 1.f;
        Py_XDECREF(m_item);
        Py_XDECREF(s_item);
    }
    if (PyErr_Occurred()) {
        PyBuffer_Release(&src);
        return NULL;
    }

    const int grid_h = dst_h / patch;
    const int grid_w = dst_w / patch;
    const size_t row_len = (size_t)3 * temporal * patch * patch;
    const size_t out_floats = (size_t)grid_h * grid_w * row_len;

    PyObject *out_bytes = PyBytes_FromStringAndSize(NULL,
                                                    out_floats * sizeof(float));
    if (out_bytes == NULL) {
        PyBuffer_Release(&src);
        return NULL;
    }
    float *planar = (float *)malloc(sizeof(float) * 3 * dst_h * dst_w);
    if (planar == NULL) {
        Py_DECREF(out_bytes);
        PyBuffer_Release(&src);
        return PyErr_NoMemory();
    }

    int rn_rc;
    Py_BEGIN_ALLOW_THREADS
    rn_rc = resize_normalize((const uint8_t *)src.buf, src_h, src_w,
                             planar, dst_h, dst_w, mean, stdv);
    if (rn_rc == 0) {
        patchify(planar, dst_h, dst_w,
                 (float *)PyBytes_AS_STRING(out_bytes), temporal, patch,
                 merge);
    }
    Py_END_ALLOW_THREADS

    free(planar);
    PyBuffer_Release(&src);
    if (rn_rc != 0) {
        Py_DECREF(out_bytes);
        return PyErr_NoMemory();
    }
    return out_bytes;
}

static PyMethodDef Methods[] = {
    {"resize_normalize_patchify", py_resize_normalize_patchify, METH_VARARGS,
     "Fused bicubic resize + normalize + Qwen2-VL patchify."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_vis_native", NULL, -1, Methods,
};

PyMODINIT_FUNC PyInit__vis_native(void) {
    return PyModule_Create(&moduledef);
}
