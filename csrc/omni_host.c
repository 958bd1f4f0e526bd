/* Native host-side runtime core.
 *
 * Parity role: the reference's native runtime components (vLLM's C++
 * block manager / scheduler hot loops and msgspec serialization; see
 * SURVEY.md section 2.10). The TPU compute path is JAX/XLA/Pallas; this
 * module keeps the HOST side of the step loop native: per-request slot
 * mapping fills, fused multi-step window slot precomputation, and the
 * packed int32 descriptor assembly that feeds the jitted step.
 *
 * Plain CPython C API (pybind11 is not available in this image); all
 * functions operate in-place on caller-owned contiguous numpy buffers
 * passed through the buffer protocol, so there is no allocation or
 * copying on the hot path.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>

/* fill_slots(slots, blocks, start, n, block_size, t0)
 *   slots  : int32 writable buffer, token-axis slot mapping
 *   blocks : int32 buffer, the request's block table
 *   positions start..start+n-1 map to slots[t0..t0+n-1]. */
static PyObject *
fill_slots(PyObject *self, PyObject *args)
{
    Py_buffer slots, blocks;
    Py_ssize_t start, n, block_size, t0;
    if (!PyArg_ParseTuple(args, "w*y*nnnn", &slots, &blocks,
                          &start, &n, &block_size, &t0))
        return NULL;
    int32_t *s = (int32_t *)slots.buf;
    const int32_t *b = (const int32_t *)blocks.buf;
    Py_ssize_t nslots = slots.len / (Py_ssize_t)sizeof(int32_t);
    Py_ssize_t nblocks = blocks.len / (Py_ssize_t)sizeof(int32_t);
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_ssize_t pos = start + i;
        Py_ssize_t bi = pos / block_size;
        if (t0 + i >= nslots || bi >= nblocks) {
            PyBuffer_Release(&slots);
            PyBuffer_Release(&blocks);
            PyErr_SetString(PyExc_IndexError, "fill_slots out of range");
            return NULL;
        }
        s[t0 + i] = b[bi] * (int32_t)block_size
                    + (int32_t)(pos % block_size);
    }
    PyBuffer_Release(&slots);
    PyBuffer_Release(&blocks);
    Py_RETURN_NONE;
}

/* fill_window_slots(extra, blocks, last_pos, block_size, t, T)
 *   extra : int32 writable buffer viewed as [K-1, T]
 *   per fused decode sub-step k (1-based), the token at column t
 *   advances to position last_pos + k. */
static PyObject *
fill_window_slots(PyObject *self, PyObject *args)
{
    Py_buffer extra, blocks;
    Py_ssize_t last_pos, block_size, t, T;
    if (!PyArg_ParseTuple(args, "w*y*nnnn", &extra, &blocks,
                          &last_pos, &block_size, &t, &T))
        return NULL;
    int32_t *e = (int32_t *)extra.buf;
    const int32_t *b = (const int32_t *)blocks.buf;
    Py_ssize_t K1 = (extra.len / (Py_ssize_t)sizeof(int32_t)) / T;
    Py_ssize_t nblocks = blocks.len / (Py_ssize_t)sizeof(int32_t);
    for (Py_ssize_t k = 1; k <= K1; k++) {
        Py_ssize_t pos = last_pos + k;
        Py_ssize_t bi = pos / block_size;
        if (bi >= nblocks) {
            PyBuffer_Release(&extra);
            PyBuffer_Release(&blocks);
            PyErr_SetString(PyExc_IndexError,
                            "fill_window_slots out of range");
            return NULL;
        }
        e[(k - 1) * T + t] = b[bi] * (int32_t)block_size
                             + (int32_t)(pos % block_size);
    }
    PyBuffer_Release(&extra);
    PyBuffer_Release(&blocks);
    Py_RETURN_NONE;
}

/* fill_token_range(dst_ids, dst_pos, dst_rows, src_ids, start, n, t0, row)
 *   vectorized fill of the token-axis arrays for one request chunk:
 *   dst_ids[t0+i] = src_ids[start+i]; dst_pos[t0+i] = start+i;
 *   dst_rows[t0+i] = row. src may be shorter (decode: token unknown,
 *   caller pre-zeroed). */
static PyObject *
fill_token_range(PyObject *self, PyObject *args)
{
    Py_buffer ids, pos, rows, src;
    Py_ssize_t start, n, t0, row;
    if (!PyArg_ParseTuple(args, "w*w*w*y*nnnn", &ids, &pos, &rows, &src,
                          &start, &n, &t0, &row))
        return NULL;
    int32_t *di = (int32_t *)ids.buf;
    int32_t *dp = (int32_t *)pos.buf;
    int32_t *dr = (int32_t *)rows.buf;
    const int32_t *si = (const int32_t *)src.buf;
    Py_ssize_t nsrc = src.len / (Py_ssize_t)sizeof(int32_t);
    Py_ssize_t ndst = ids.len / (Py_ssize_t)sizeof(int32_t);
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_ssize_t t = t0 + i, p = start + i;
        if (t >= ndst) {
            PyBuffer_Release(&ids); PyBuffer_Release(&pos);
            PyBuffer_Release(&rows); PyBuffer_Release(&src);
            PyErr_SetString(PyExc_IndexError, "fill_token_range oob");
            return NULL;
        }
        di[t] = (p < nsrc) ? si[p] : 0;
        dp[t] = (int32_t)p;
        dr[t] = (int32_t)row;
    }
    PyBuffer_Release(&ids); PyBuffer_Release(&pos);
    PyBuffer_Release(&rows); PyBuffer_Release(&src);
    Py_RETURN_NONE;
}

static PyMethodDef Methods[] = {
    {"fill_slots", fill_slots, METH_VARARGS,
     "Fill token-axis KV slot mapping for one request chunk."},
    {"fill_window_slots", fill_window_slots, METH_VARARGS,
     "Precompute fused multi-step window slots for one row."},
    {"fill_token_range", fill_token_range, METH_VARARGS,
     "Fill token ids/positions/rows for one request chunk."},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_omni_host",
    "Native host-side runtime core (descriptor fill loops).",
    -1, Methods
};

PyMODINIT_FUNC
PyInit__omni_host(void)
{
    return PyModule_Create(&moduledef);
}
