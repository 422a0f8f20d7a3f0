/* _imagio: native image codec runtime for kmeans_tpu.
 *
 * C replacement for the reference CLI's use of the Rust `image` crate
 * (decode/encode of PNG and JPEG, reference cli/src/main.rs:53,80,107 and
 * cli/Cargo.toml) and the `gif` crate used by the examples
 * (core/examples/gif.rs, parallel.rs). Exposed to Python through the raw
 * CPython C API (no pybind11 in this environment):
 *
 *   decode_png(data: bytes)  -> (width, height, rgba: bytes)
 *   encode_png(w, h, rgba: bytes) -> bytes
 *   decode_jpeg(data: bytes) -> (width, height, rgba: bytes)
 *   encode_jpeg(w, h, rgba: bytes, quality: int) -> bytes
 *   encode_gif(w, h, frames: list[(palette: bytes, indices: bytes)],
 *              delay_cs: int, loop: bool) -> bytes
 *
 * All pixel buffers are tightly packed 8-bit RGBA (decode) and the GIF
 * encoder takes per-frame palettes (<=256 RGB entries) plus 8-bit index
 * arrays — the quantization itself is this framework's job, not the
 * codec's. The GIF LZW compressor is implemented here from the GIF89a
 * specification.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <png.h>
#include <jpeglib.h>
#include <setjmp.h>
#include <stdlib.h>
#include <string.h>

/* ------------------------------------------------------------------ */
/* Decode budget                                                       */
/* ------------------------------------------------------------------ */

/* Max total decoded pixels one decode call may produce (summed over GIF
 * frames). Untrusted bytes can declare enormous dimensions in a tiny
 * payload — a 100-byte GIF claiming 65535x65535 would otherwise allocate
 * 17 GB before any data validation (decompression bomb / DoS against the
 * serving daemon). Default 512 Mpix (2 GB RGBA); adjustable from Python
 * via set_max_decode_pixels(). */
static size_t imagio_max_pixels = (size_t)512 * 1024 * 1024;

static int
imagio_check_pixels(size_t w, size_t h)
{
    if (w == 0 || h == 0 || w > imagio_max_pixels / h) {
        PyErr_Format(PyExc_ValueError,
                     "image dimensions %zux%zu exceed the decode limit of "
                     "%zu pixels (raise it with "
                     "kmeans_tpu.utils.imageio.set_max_decode_pixels)",
                     w, h, imagio_max_pixels);
        return -1;
    }
    return 0;
}

/* ------------------------------------------------------------------ */
/* PNG                                                                 */
/* ------------------------------------------------------------------ */

typedef struct {
    const unsigned char *data;
    size_t size;
    size_t pos;
} png_read_state;

static void
png_mem_read(png_structp png, png_bytep out, png_size_t count)
{
    png_read_state *st = (png_read_state *)png_get_io_ptr(png);
    if (st->pos + count > st->size) {
        png_error(png, "read past end of PNG buffer");
        return;
    }
    memcpy(out, st->data + st->pos, count);
    st->pos += count;
}

typedef struct {
    unsigned char *data;
    size_t size;
    size_t cap;
} byte_vec;

static int
byte_vec_push(byte_vec *v, const unsigned char *data, size_t count)
{
    if (v->size + count > v->cap) {
        size_t cap = v->cap ? v->cap : 65536;
        while (cap < v->size + count)
            cap *= 2;
        unsigned char *p = (unsigned char *)realloc(v->data, cap);
        if (!p)
            return -1;
        v->data = p;
        v->cap = cap;
    }
    memcpy(v->data + v->size, data, count);
    v->size += count;
    return 0;
}

static void
png_mem_write(png_structp png, png_bytep data, png_size_t count)
{
    byte_vec *v = (byte_vec *)png_get_io_ptr(png);
    if (byte_vec_push(v, data, count) != 0)
        png_error(png, "out of memory");
}

static void
png_mem_flush(png_structp png)
{
    (void)png;
}

static PyObject *
imagio_decode_png(PyObject *self, PyObject *args)
{
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf))
        return NULL;

    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
    png_infop info = png ? png_create_info_struct(png) : NULL;
    /* volatile: read after longjmp (C11 7.13.2.1) */
    png_bytep *volatile rows = NULL;
    unsigned char *volatile out = NULL;
    PyObject *result = NULL;

    if (!png || !info) {
        PyErr_SetString(PyExc_MemoryError, "libpng init failed");
        goto done;
    }
    if (setjmp(png_jmpbuf(png))) {
        PyErr_SetString(PyExc_ValueError, "invalid PNG data");
        goto done;
    }

    png_read_state st = {(const unsigned char *)buf.buf, (size_t)buf.len, 0};
    png_set_read_fn(png, &st, png_mem_read);
    png_read_info(png, info);

    png_uint_32 w = png_get_image_width(png, info);
    png_uint_32 h = png_get_image_height(png, info);
    if (imagio_check_pixels(w, h))
        goto done;
    int bit_depth = png_get_bit_depth(png, info);
    int color_type = png_get_color_type(png, info);

    /* Normalize everything to 8-bit RGBA. */
    if (bit_depth == 16)
        png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE)
        png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS))
        png_set_tRNS_to_alpha(png);
    if (color_type == PNG_COLOR_TYPE_RGB || color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_PALETTE)
        png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
    if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    png_read_update_info(png, info);

    size_t stride = (size_t)w * 4;
    out = (unsigned char *)malloc(stride * h);
    rows = (png_bytep *)malloc(sizeof(png_bytep) * h);
    if (!out || !rows) {
        PyErr_NoMemory();
        goto done;
    }
    for (png_uint_32 y = 0; y < h; y++)
        rows[y] = out + y * stride;
    png_read_image(png, rows);
    png_read_end(png, NULL);

    result = Py_BuildValue("IIy#", (unsigned int)w, (unsigned int)h,
                           (const char *)out, (Py_ssize_t)(stride * h));

done:
    if (png)
        png_destroy_read_struct(&png, info ? &info : NULL, NULL);
    free(rows);
    free(out);
    PyBuffer_Release(&buf);
    return result;
}

static PyObject *
imagio_encode_png(PyObject *self, PyObject *args)
{
    unsigned int w, h;
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "IIy*", &w, &h, &buf))
        return NULL;
    if ((size_t)buf.len != (size_t)w * h * 4) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "rgba buffer must be w*h*4 bytes");
        return NULL;
    }

    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
    png_infop info = png ? png_create_info_struct(png) : NULL;
    /* volatile: read after longjmp */
    png_bytep *volatile rows = NULL;
    static _Thread_local byte_vec vec;  /* stable storage across longjmp */
    vec.data = NULL;
    vec.size = 0;
    vec.cap = 0;
    PyObject *result = NULL;

    if (!png || !info) {
        PyErr_SetString(PyExc_MemoryError, "libpng init failed");
        goto done;
    }
    if (setjmp(png_jmpbuf(png))) {
        PyErr_SetString(PyExc_ValueError, "PNG encode failed");
        goto done;
    }

    png_set_write_fn(png, &vec, png_mem_write, png_mem_flush);
    png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGBA, PNG_INTERLACE_NONE,
                 PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
    png_write_info(png, info);

    rows = (png_bytep *)malloc(sizeof(png_bytep) * h);
    if (!rows) {
        PyErr_NoMemory();
        goto done;
    }
    for (unsigned int y = 0; y < h; y++)
        rows[y] = (png_bytep)((unsigned char *)buf.buf + (size_t)y * w * 4);
    png_write_image(png, rows);
    png_write_end(png, NULL);

    result = PyBytes_FromStringAndSize((const char *)vec.data, (Py_ssize_t)vec.size);

done:
    if (png)
        png_destroy_write_struct(&png, info ? &info : NULL);
    free(rows);
    free(vec.data);
    PyBuffer_Release(&buf);
    return result;
}

static PyObject *
imagio_encode_png_indexed(PyObject *self, PyObject *args)
{
    /* Palette (color type 3) PNG: 1 byte/px — ~4x faster to deflate and
     * much smaller than RGBA for quantized images (<= 256 colors). */
    unsigned int w, h;
    Py_buffer pal, idx;
    if (!PyArg_ParseTuple(args, "IIy*y*", &w, &h, &pal, &idx))
        return NULL;
    size_t ncolors = (size_t)pal.len / 4;
    if (pal.len % 4 != 0 || ncolors == 0 || ncolors > 256 ||
        (size_t)idx.len != (size_t)w * h || w == 0 || h == 0) {
        PyBuffer_Release(&pal);
        PyBuffer_Release(&idx);
        PyErr_SetString(PyExc_ValueError,
                        "expected (w, h, rgba palette <=256*4, w*h index bytes)");
        return NULL;
    }
    {
        const unsigned char *ip = (const unsigned char *)idx.buf;
        for (size_t q = 0; q < (size_t)idx.len; q++) {
            if (ip[q] >= ncolors) {
                PyBuffer_Release(&pal);
                PyBuffer_Release(&idx);
                PyErr_SetString(PyExc_ValueError, "index out of palette range");
                return NULL;
            }
        }
    }

    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
    png_infop info = png ? png_create_info_struct(png) : NULL;
    png_bytep *volatile rows = NULL;
    static _Thread_local byte_vec vec;
    vec.data = NULL;
    vec.size = 0;
    vec.cap = 0;
    PyObject *result = NULL;

    if (!png || !info) {
        PyErr_SetString(PyExc_MemoryError, "libpng init failed");
        goto done;
    }
    if (setjmp(png_jmpbuf(png))) {
        PyErr_SetString(PyExc_ValueError, "PNG encode failed");
        goto done;
    }

    png_set_write_fn(png, &vec, png_mem_write, png_mem_flush);
    png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_PALETTE, PNG_INTERLACE_NONE,
                 PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
    {
        png_color plte[256];
        png_byte trns[256];
        int has_alpha = 0;
        const unsigned char *pp = (const unsigned char *)pal.buf;
        for (size_t i = 0; i < ncolors; i++) {
            plte[i].red = pp[i * 4 + 0];
            plte[i].green = pp[i * 4 + 1];
            plte[i].blue = pp[i * 4 + 2];
            trns[i] = pp[i * 4 + 3];
            if (trns[i] != 0xFF)
                has_alpha = 1;
        }
        png_set_PLTE(png, info, plte, (int)ncolors);
        if (has_alpha)
            png_set_tRNS(png, info, trns, (int)ncolors, NULL);
    }
    png_write_info(png, info);

    rows = (png_bytep *)malloc(sizeof(png_bytep) * h);
    if (!rows) {
        PyErr_NoMemory();
        goto done;
    }
    for (unsigned int y = 0; y < h; y++)
        rows[y] = (png_bytep)((unsigned char *)idx.buf + (size_t)y * w);
    png_write_image(png, rows);
    png_write_end(png, NULL);

    result = PyBytes_FromStringAndSize((const char *)vec.data, (Py_ssize_t)vec.size);

done:
    if (png)
        png_destroy_write_struct(&png, info ? &info : NULL);
    free(rows);
    free(vec.data);
    PyBuffer_Release(&pal);
    PyBuffer_Release(&idx);
    return result;
}

/* ------------------------------------------------------------------ */
/* JPEG                                                                */
/* ------------------------------------------------------------------ */

struct imagio_jpeg_error {
    struct jpeg_error_mgr mgr;
    jmp_buf jump;
};

static void
imagio_jpeg_error_exit(j_common_ptr cinfo)
{
    struct imagio_jpeg_error *err = (struct imagio_jpeg_error *)cinfo->err;
    longjmp(err->jump, 1);
}

static PyObject *
imagio_decode_jpeg(PyObject *self, PyObject *args)
{
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf))
        return NULL;

    struct jpeg_decompress_struct cinfo;
    struct imagio_jpeg_error jerr;
    /* volatile: read after longjmp (C11 7.13.2.1) */
    unsigned char *volatile out = NULL;
    unsigned char *volatile row = NULL;
    PyObject *result = NULL;
    volatile int created = 0;

    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = imagio_jpeg_error_exit;
    if (setjmp(jerr.jump)) {
        PyErr_SetString(PyExc_ValueError, "invalid JPEG data");
        goto done;
    }

    jpeg_create_decompress(&cinfo);
    created = 1;
    jpeg_mem_src(&cinfo, (const unsigned char *)buf.buf, (unsigned long)buf.len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);

    size_t w = cinfo.output_width, h = cinfo.output_height;
    if (imagio_check_pixels(w, h))
        goto done;
    size_t row_rgb = w * 3;
    out = (unsigned char *)malloc(w * h * 4);
    row = (unsigned char *)malloc(row_rgb);
    if (!out || !row) {
        PyErr_NoMemory();
        goto done;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        size_t y = cinfo.output_scanline;
        JSAMPROW rp = (JSAMPROW)row;
        jpeg_read_scanlines(&cinfo, &rp, 1);
        unsigned char *dst = out + y * w * 4;
        for (size_t x = 0; x < w; x++) {
            dst[x * 4 + 0] = row[x * 3 + 0];
            dst[x * 4 + 1] = row[x * 3 + 1];
            dst[x * 4 + 2] = row[x * 3 + 2];
            dst[x * 4 + 3] = 0xFF;
        }
    }
    jpeg_finish_decompress(&cinfo);

    result = Py_BuildValue("IIy#", (unsigned int)w, (unsigned int)h,
                           (const char *)out, (Py_ssize_t)(w * h * 4));

done:
    if (created)
        jpeg_destroy_decompress(&cinfo);
    free(row);
    free(out);
    PyBuffer_Release(&buf);
    return result;
}

static PyObject *
imagio_encode_jpeg(PyObject *self, PyObject *args)
{
    unsigned int w, h;
    int quality = 90;
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "IIy*|i", &w, &h, &buf, &quality))
        return NULL;
    if ((size_t)buf.len != (size_t)w * h * 4) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "rgba buffer must be w*h*4 bytes");
        return NULL;
    }

    struct jpeg_compress_struct cinfo;
    struct imagio_jpeg_error jerr;
    /* volatile: read after longjmp */
    unsigned char *volatile mem = NULL;
    unsigned long mem_size = 0;
    unsigned char *volatile row = NULL;
    PyObject *result = NULL;
    volatile int created = 0;

    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = imagio_jpeg_error_exit;
    if (setjmp(jerr.jump)) {
        PyErr_SetString(PyExc_ValueError, "JPEG encode failed");
        goto done;
    }

    jpeg_create_compress(&cinfo);
    created = 1;
    jpeg_mem_dest(&cinfo, (unsigned char **)&mem, &mem_size);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    jpeg_start_compress(&cinfo, TRUE);

    row = (unsigned char *)malloc((size_t)w * 3);
    if (!row) {
        PyErr_NoMemory();
        goto done;
    }
    while (cinfo.next_scanline < cinfo.image_height) {
        const unsigned char *src =
            (const unsigned char *)buf.buf + (size_t)cinfo.next_scanline * w * 4;
        for (unsigned int x = 0; x < w; x++) {
            row[x * 3 + 0] = src[x * 4 + 0];
            row[x * 3 + 1] = src[x * 4 + 1];
            row[x * 3 + 2] = src[x * 4 + 2];
        }
        JSAMPROW rp = (JSAMPROW)row;
        jpeg_write_scanlines(&cinfo, &rp, 1);
    }
    jpeg_finish_compress(&cinfo);

    result = PyBytes_FromStringAndSize((const char *)mem, (Py_ssize_t)mem_size);

done:
    if (created)
        jpeg_destroy_compress(&cinfo);
    free(row);
    free(mem);
    PyBuffer_Release(&buf);
    return result;
}

/* ------------------------------------------------------------------ */
/* GIF (GIF89a encoder with LZW compression)                           */
/* ------------------------------------------------------------------ */

typedef struct {
    byte_vec *out;
    unsigned char block[255];
    int block_len;
    unsigned int bit_buf;
    int bit_count;
} lzw_writer;

static int
lzw_flush_block(lzw_writer *w)
{
    if (w->block_len > 0) {
        unsigned char len = (unsigned char)w->block_len;
        if (byte_vec_push(w->out, &len, 1) != 0)
            return -1;
        if (byte_vec_push(w->out, w->block, w->block_len) != 0)
            return -1;
        w->block_len = 0;
    }
    return 0;
}

static int
lzw_put_code(lzw_writer *w, unsigned int code, int width)
{
    w->bit_buf |= code << w->bit_count;
    w->bit_count += width;
    while (w->bit_count >= 8) {
        w->block[w->block_len++] = (unsigned char)(w->bit_buf & 0xFF);
        w->bit_buf >>= 8;
        w->bit_count -= 8;
        if (w->block_len == 255 && lzw_flush_block(w) != 0)
            return -1;
    }
    return 0;
}

/* Hash-table LZW: 12-bit max code, (prefix, char) -> code. */
#define LZW_MAX_CODE 4096
#define LZW_HASH_SIZE 8192

static int
lzw_compress(byte_vec *out, const unsigned char *pixels, size_t n, int min_code_size)
{
    if (n == 0)
        return -1;
    int clear_code = 1 << min_code_size;
    int end_code = clear_code + 1;

    int *hash_key = (int *)malloc(sizeof(int) * LZW_HASH_SIZE);
    int *hash_val = (int *)malloc(sizeof(int) * LZW_HASH_SIZE);
    if (!hash_key || !hash_val) {
        free(hash_key);
        free(hash_val);
        return -1;
    }

    lzw_writer w = {out, {0}, 0, 0, 0};
    int code_size = min_code_size + 1;
    int next_code = end_code + 1;
    memset(hash_key, 0xFF, sizeof(int) * LZW_HASH_SIZE);

    int rc = -1;
    if (lzw_put_code(&w, (unsigned)clear_code, code_size) != 0)
        goto fail;

    int prefix = pixels[0];
    for (size_t i = 1; i < n; i++) {
        int c = pixels[i];
        int key = (prefix << 8) | c;
        int slot = ((prefix * 31) ^ c) & (LZW_HASH_SIZE - 1);
        int found = -1;
        while (hash_key[slot] != -1) {
            if (hash_key[slot] == key) {
                found = hash_val[slot];
                break;
            }
            slot = (slot + 1) & (LZW_HASH_SIZE - 1);
        }
        if (found >= 0) {
            prefix = found;
            continue;
        }
        if (lzw_put_code(&w, (unsigned)prefix, code_size) != 0)
            goto fail;
        if (next_code < LZW_MAX_CODE) {
            hash_key[slot] = key;
            hash_val[slot] = next_code;
            if (next_code == (1 << code_size))
                code_size++;
            next_code++;
        } else {
            if (lzw_put_code(&w, (unsigned)clear_code, code_size) != 0)
                goto fail;
            memset(hash_key, 0xFF, sizeof(int) * LZW_HASH_SIZE);
            code_size = min_code_size + 1;
            next_code = end_code + 1;
        }
        prefix = c;
    }
    if (lzw_put_code(&w, (unsigned)prefix, code_size) != 0)
        goto fail;
    if (lzw_put_code(&w, (unsigned)end_code, code_size) != 0)
        goto fail;
    if (w.bit_count > 0) {
        w.block[w.block_len++] = (unsigned char)(w.bit_buf & 0xFF);
        if (w.block_len == 255 && lzw_flush_block(&w) != 0)
            goto fail;
    }
    if (lzw_flush_block(&w) != 0)
        goto fail;
    rc = 0;
fail:
    free(hash_key);
    free(hash_val);
    return rc;
}

static int
push_u16le(byte_vec *v, unsigned int value)
{
    unsigned char b[2] = {(unsigned char)(value & 0xFF), (unsigned char)(value >> 8)};
    return byte_vec_push(v, b, 2);
}

static PyObject *
imagio_encode_gif(PyObject *self, PyObject *args)
{
    unsigned int w, h;
    PyObject *frames;
    int delay_cs = 100;
    int loop = 1;
    if (!PyArg_ParseTuple(args, "IIO|ip", &w, &h, &frames, &delay_cs, &loop))
        return NULL;
    if (!PyList_Check(frames) || PyList_Size(frames) == 0) {
        PyErr_SetString(PyExc_ValueError, "frames must be a non-empty list");
        return NULL;
    }

    byte_vec out = {NULL, 0, 0};
    PyObject *result = NULL;
    /* Frame buffer views currently held; released on every exit path. */
    Py_buffer pal = {0}, idx = {0};
    int views_held = 0;

#define CHECK(expr)                                                            \
    do {                                                                       \
        if ((expr) != 0) {                                                     \
            PyErr_NoMemory();                                                  \
            goto done;                                                         \
        }                                                                      \
    } while (0)

    CHECK(byte_vec_push(&out, (const unsigned char *)"GIF89a", 6));
    CHECK(push_u16le(&out, w));
    CHECK(push_u16le(&out, h));
    {
        /* No global color table; 8-bit color resolution. */
        unsigned char screen[3] = {0x70, 0x00, 0x00};
        CHECK(byte_vec_push(&out, screen, 3));
    }
    if (loop) {
        /* Netscape application extension for infinite looping. */
        static const unsigned char loop_ext[] = {
            0x21, 0xFF, 0x0B, 'N', 'E', 'T', 'S', 'C', 'A', 'P', 'E',
            '2', '.', '0', 0x03, 0x01, 0x00, 0x00, 0x00};
        CHECK(byte_vec_push(&out, loop_ext, sizeof(loop_ext)));
    }

    for (Py_ssize_t i = 0; i < PyList_Size(frames); i++) {
        PyObject *item = PyList_GetItem(frames, i);
        int frame_delay = delay_cs;
        if (!PyArg_ParseTuple(item, "y*y*|i", &pal, &idx, &frame_delay)) {
            goto done;
        }
        views_held = 1;
        size_t ncolors = (size_t)pal.len / 3;
        if (pal.len % 3 != 0 || ncolors == 0 || ncolors > 256 || w == 0 ||
            h == 0 || (size_t)idx.len != (size_t)w * h) {
            PyErr_SetString(PyExc_ValueError,
                            "frame must be (palette rgb bytes <=256*3, w*h index bytes)"
                            " with nonzero dimensions");
            goto done;
        }
        {
            const unsigned char *ip = (const unsigned char *)idx.buf;
            for (Py_ssize_t q = 0; q < idx.len; q++) {
                if (ip[q] >= ncolors) {
                    PyErr_SetString(PyExc_ValueError,
                                    "frame index out of palette range");
                    goto done;
                }
            }
        }
        /* Color table size: power of two >= ncolors, >= 2. */
        int bits = 1;
        while ((size_t)(1 << bits) < ncolors)
            bits++;
        size_t table = (size_t)1 << bits;

        /* Graphic control extension (delay). */
        unsigned char gce[8] = {0x21, 0xF9, 0x04, 0x00,
                                (unsigned char)(frame_delay & 0xFF),
                                (unsigned char)((frame_delay >> 8) & 0xFF), 0x00, 0x00};
        CHECK(byte_vec_push(&out, gce, sizeof(gce)));

        /* Image descriptor with local color table. */
        unsigned char desc[1] = {0x2C};
        CHECK(byte_vec_push(&out, desc, 1));
        CHECK(push_u16le(&out, 0));
        CHECK(push_u16le(&out, 0));
        CHECK(push_u16le(&out, w));
        CHECK(push_u16le(&out, h));
        {
            unsigned char flags = (unsigned char)(0x80 | (bits - 1));
            CHECK(byte_vec_push(&out, &flags, 1));
        }
        CHECK(byte_vec_push(&out, (const unsigned char *)pal.buf, pal.len));
        for (size_t p = ncolors; p < table; p++) {
            static const unsigned char zero[3] = {0, 0, 0};
            CHECK(byte_vec_push(&out, zero, 3));
        }

        int min_code_size = bits < 2 ? 2 : bits;
        unsigned char mcs = (unsigned char)min_code_size;
        CHECK(byte_vec_push(&out, &mcs, 1));
        if (lzw_compress(&out, (const unsigned char *)idx.buf, (size_t)idx.len,
                         min_code_size) != 0) {
            PyErr_NoMemory();
            goto done;
        }
        {
            unsigned char term = 0x00;
            CHECK(byte_vec_push(&out, &term, 1));
        }
        PyBuffer_Release(&pal);
        PyBuffer_Release(&idx);
        views_held = 0;
    }
    {
        unsigned char trailer = 0x3B;
        CHECK(byte_vec_push(&out, &trailer, 1));
    }
#undef CHECK

    result = PyBytes_FromStringAndSize((const char *)out.data, (Py_ssize_t)out.size);

done:
    if (views_held) {
        PyBuffer_Release(&pal);
        PyBuffer_Release(&idx);
    }
    free(out.data);
    return result;
}

/* ------------------------------------------------------------------ */
/* GIF decoder (GIF87a/89a): full-canvas compositing with disposal and
 * transparency, LZW decompression per the spec.                       */
/* ------------------------------------------------------------------ */

typedef struct {
    const unsigned char *p;
    size_t len;
    size_t pos;
} gif_reader;

static int
gif_need(gif_reader *r, size_t n)
{
    return r->pos + n <= r->len;
}

static unsigned int
gif_u16(gif_reader *r)
{
    unsigned int v = r->p[r->pos] | (r->p[r->pos + 1] << 8);
    r->pos += 2;
    return v;
}

/* Decode one image's LZW data (sub-blocks at r->pos) into indices[npx]. */
static int
gif_lzw_decode(gif_reader *r, int min_code_size, unsigned char *out, size_t npx)
{
    int clear = 1 << min_code_size;
    int end = clear + 1;
    /* code -> (prefix code, appended byte, length) */
    static int prefix[LZW_MAX_CODE];
    static unsigned char append[LZW_MAX_CODE];
    static unsigned char stack[LZW_MAX_CODE];

    int code_size = min_code_size + 1;
    int next_code = end + 1;
    int prev = -1;
    size_t out_pos = 0;

    unsigned int bit_buf = 0;
    int bit_count = 0;
    int block_rem = 0;

    for (int i = 0; i < clear; i++) {
        prefix[i] = -1;
        append[i] = (unsigned char)i;
    }

    while (out_pos < npx) {
        while (bit_count < code_size) {
            if (block_rem == 0) {
                if (!gif_need(r, 1))
                    return -1;
                block_rem = r->p[r->pos++];
                if (block_rem == 0)
                    return out_pos == npx ? 0 : -1;
            }
            if (!gif_need(r, 1))
                return -1;
            bit_buf |= (unsigned int)r->p[r->pos++] << bit_count;
            bit_count += 8;
            block_rem--;
        }
        int code = (int)(bit_buf & ((1u << code_size) - 1));
        bit_buf >>= code_size;
        bit_count -= code_size;

        if (code == clear) {
            code_size = min_code_size + 1;
            next_code = end + 1;
            prev = -1;
            continue;
        }
        if (code == end)
            break;

        int emit_code = code;
        int stack_len = 0;
        if (code >= next_code) {
            if (prev < 0 || code > next_code)
                return -1;
            /* KwKwK case: emit prev + first(prev). */
            stack[stack_len++] = 0; /* placeholder for first char */
            emit_code = prev;
        }
        while (emit_code >= 0) {
            if (stack_len >= LZW_MAX_CODE)
                return -1;
            stack[stack_len++] = append[emit_code];
            emit_code = prefix[emit_code];
        }
        unsigned char first = stack[stack_len - 1];
        if (code >= next_code)
            stack[0] = first; /* fill placeholder */
        for (int i = stack_len - 1; i >= 0 && out_pos < npx; i--)
            out[out_pos++] = stack[i];

        if (prev >= 0 && next_code < LZW_MAX_CODE) {
            prefix[next_code] = prev;
            append[next_code] = first;
            next_code++;
            if (next_code == (1 << code_size) && code_size < 12)
                code_size++;
        }
        prev = code;
    }
    /* Skip the rest of the current sub-block, then remaining sub-blocks
     * up to the terminator. */
    if (block_rem > 0) {
        if (!gif_need(r, (size_t)block_rem))
            return -1;
        r->pos += block_rem;
    }
    while (gif_need(r, 1)) {
        int n = r->p[r->pos++];
        if (n == 0)
            break;
        if (!gif_need(r, n))
            return -1;
        r->pos += n;
    }
    return 0;
}

static PyObject *
imagio_decode_gif(PyObject *self, PyObject *args)
{
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf))
        return NULL;

    gif_reader r = {(const unsigned char *)buf.buf, (size_t)buf.len, 0};
    PyObject *frames = NULL;
    PyObject *delays = NULL;
    unsigned char *canvas = NULL, *prev_canvas = NULL, *indices = NULL;
    unsigned char gct[256 * 3];
    int gct_size = 0;

#define FAIL(msg)                                                              \
    do {                                                                       \
        PyErr_SetString(PyExc_ValueError, msg);                                \
        goto fail;                                                             \
    } while (0)

    if (!gif_need(&r, 13) || memcmp(r.p, "GIF8", 4) != 0)
        FAIL("not a GIF file");
    r.pos = 6;
    unsigned int width = gif_u16(&r);
    unsigned int height = gif_u16(&r);
    unsigned char flags = r.p[r.pos++];
    r.pos += 2; /* bg color index + aspect */
    if (flags & 0x80) {
        gct_size = 2 << (flags & 0x07);
        if (!gif_need(&r, (size_t)gct_size * 3))
            FAIL("truncated GIF global color table");
        memcpy(gct, r.p + r.pos, (size_t)gct_size * 3);
        r.pos += (size_t)gct_size * 3;
    }

    if (imagio_check_pixels(width, height))
        goto fail;
    size_t npx = (size_t)width * height;
    size_t total_px = 0; /* summed over emitted frames, same budget */
    canvas = (unsigned char *)calloc(npx * 4, 1);
    prev_canvas = (unsigned char *)malloc(npx * 4);
    indices = (unsigned char *)malloc(npx);
    frames = PyList_New(0);
    if (!canvas || !prev_canvas || !indices || !frames) {
        PyErr_NoMemory();
        goto fail;
    }

    int transparent = -1;
    int disposal = 0;
    int delay_cs = 0;
    delays = PyList_New(0);
    if (!delays) {
        PyErr_NoMemory();
        goto fail;
    }

    while (gif_need(&r, 1)) {
        unsigned char block = r.p[r.pos++];
        if (block == 0x3B)
            break; /* trailer */
        if (block == 0x21) {
            /* extension */
            if (!gif_need(&r, 1))
                FAIL("truncated GIF extension");
            unsigned char label = r.p[r.pos++];
            if (label == 0xF9) {
                if (!gif_need(&r, 6))
                    FAIL("truncated GCE");
                unsigned char len = r.p[r.pos++];
                unsigned char gflags = r.p[r.pos];
                disposal = (gflags >> 2) & 0x07;
                delay_cs = r.p[r.pos + 1] | (r.p[r.pos + 2] << 8);
                transparent = (gflags & 1) ? r.p[r.pos + 3] : -1;
                r.pos += len;
                if (!gif_need(&r, 1) || r.p[r.pos++] != 0)
                    FAIL("bad GCE terminator");
            } else {
                /* skip sub-blocks */
                while (gif_need(&r, 1)) {
                    unsigned char n = r.p[r.pos++];
                    if (n == 0)
                        break;
                    if (!gif_need(&r, n))
                        FAIL("truncated extension");
                    r.pos += n;
                }
            }
            continue;
        }
        if (block != 0x2C)
            FAIL("unexpected GIF block");

        if (!gif_need(&r, 9))
            FAIL("truncated image descriptor");
        unsigned int ix = gif_u16(&r);
        unsigned int iy = gif_u16(&r);
        unsigned int iw = gif_u16(&r);
        unsigned int ih = gif_u16(&r);
        unsigned char iflags = r.p[r.pos++];
        int interlaced = iflags & 0x40;
        const unsigned char *table = gct;
        int table_size = gct_size;
        unsigned char lct[256 * 3];
        if (iflags & 0x80) {
            table_size = 2 << (iflags & 0x07);
            if (!gif_need(&r, (size_t)table_size * 3))
                FAIL("truncated local color table");
            memcpy(lct, r.p + r.pos, (size_t)table_size * 3);
            r.pos += (size_t)table_size * 3;
            table = lct;
        }
        if (table_size == 0)
            FAIL("GIF image with no color table");
        if (ix + iw > width || iy + ih > height)
            FAIL("GIF frame outside canvas");

        if (!gif_need(&r, 1))
            FAIL("truncated LZW header");
        int mcs = r.p[r.pos++];
        if (mcs < 2 || mcs > 11)
            FAIL("bad LZW min code size");
        size_t fpx = (size_t)iw * ih;
        if (gif_lzw_decode(&r, mcs, indices, fpx) != 0)
            FAIL("corrupt GIF LZW data");

        memcpy(prev_canvas, canvas, npx * 4);

        for (size_t i = 0; i < fpx; i++) {
            size_t row = i / iw, col = i % iw;
            if (interlaced) {
                /* interlace pass reordering */
                static const size_t start[4] = {0, 4, 2, 1};
                static const size_t step[4] = {8, 8, 4, 2};
                size_t y = 0, rem = row;
                for (int pass = 0; pass < 4; pass++) {
                    size_t rows_in_pass = (ih + step[pass] - 1 - start[pass]) / step[pass];
                    if (rem < rows_in_pass) {
                        y = start[pass] + rem * step[pass];
                        break;
                    }
                    rem -= rows_in_pass;
                }
                row = y;
            }
            int idx = indices[i];
            if (idx == transparent)
                continue;
            if (idx >= table_size)
                idx = 0;
            unsigned char *dst = canvas + (((size_t)(iy + row)) * width + ix + col) * 4;
            dst[0] = table[idx * 3 + 0];
            dst[1] = table[idx * 3 + 1];
            dst[2] = table[idx * 3 + 2];
            dst[3] = 0xFF;
        }

        total_px += npx;
        if (total_px > imagio_max_pixels) {
            PyErr_Format(PyExc_ValueError,
                         "GIF decodes to more than the limit of %zu total "
                         "pixels across frames (raise it with "
                         "kmeans_tpu.utils.imageio.set_max_decode_pixels)",
                         imagio_max_pixels);
            goto fail;
        }
        PyObject *frame = PyBytes_FromStringAndSize((const char *)canvas,
                                                    (Py_ssize_t)(npx * 4));
        if (!frame)
            goto fail;
        if (PyList_Append(frames, frame) != 0) {
            Py_DECREF(frame);
            goto fail;
        }
        Py_DECREF(frame);
        {
            PyObject *d = PyLong_FromLong(delay_cs);
            if (!d || PyList_Append(delays, d) != 0) {
                Py_XDECREF(d);
                goto fail;
            }
            Py_DECREF(d);
        }

        /* Disposal for next frame. */
        if (disposal == 2) {
            for (unsigned int y = iy; y < iy + ih; y++)
                memset(canvas + ((size_t)y * width + ix) * 4, 0, (size_t)iw * 4);
        } else if (disposal == 3) {
            memcpy(canvas, prev_canvas, npx * 4);
        }
        transparent = -1;
        disposal = 0;
    }
#undef FAIL

    {
        PyObject *result = Py_BuildValue("IINN", width, height, frames,
                                         delays); /* N steals refs */
        free(canvas);
        free(prev_canvas);
        free(indices);
        PyBuffer_Release(&buf);
        return result;
    }

fail:
    Py_XDECREF(delays);
    Py_XDECREF(frames);
    free(canvas);
    free(prev_canvas);
    free(indices);
    PyBuffer_Release(&buf);
    return NULL;
}

/* ------------------------------------------------------------------ *
 * Readback unpack fast paths.
 *
 * The fused Pallas kernels emit bit-packed device buffers (in-kernel
 * sublane index pack, ops/kernels.py::fused_assign_packed; in-kernel
 * RGB byte pack, fused_meld_packed) to cut device->host bytes; the
 * host-side inverses in utils/packing.py are numpy byte shuffles that
 * cost hundreds of ms at 4K. These C twins walk the exact same tile
 * layout in one pass (and fuse the palette gather for the indexed
 * tiers). Layout constants (tile_rows, lanes, bits) MUST come from
 * ops/kernels.py — they are a function of the palette size.
 * ------------------------------------------------------------------ */

static PyObject *
imagio_unpack_rgb24(PyObject *self, PyObject *args)
{
    Py_buffer words;
    unsigned int h, w, tile_rows, lanes;
    if (!PyArg_ParseTuple(args, "y*IIII", &words, &h, &w, &tile_rows, &lanes))
        return NULL;

    PyObject *result = NULL;
    const size_t hw = (size_t)h * w;
    const unsigned int blk = tile_rows / 4;
    if (tile_rows == 0 || lanes == 0 || blk * 4 != tile_rows ||
        (size_t)words.len % ((size_t)3 * blk * lanes * 4) != 0) {
        PyErr_SetString(PyExc_ValueError,
                        "words length does not tile (3 * tile_rows/4 * lanes"
                        " i32 words per tile; tile_rows % 4 == 0)");
        goto done;
    }
    {
        const size_t n_tiles = (size_t)words.len / ((size_t)3 * blk * lanes * 4);
        if (n_tiles * tile_rows * lanes < hw) {
            PyErr_SetString(PyExc_ValueError, "words too short for h * w");
            goto done;
        }
        /* Write straight into a bytearray: the caller wraps it with
         * np.frombuffer, so the result is WRITABLE (parity with the
         * numpy fancy-indexing fallback) and there is no final
         * PyBytes copy of the hw*4 output. */
        result = PyByteArray_FromStringAndSize(NULL, (Py_ssize_t)(hw * 4));
        if (!result)
            goto done;
        unsigned char *out = (unsigned char *)PyByteArray_AS_STRING(result);
        const unsigned char *wb = (const unsigned char *)words.buf;
        for (size_t t = 0; t < n_tiles; t++) {
            const size_t tile_px0 = t * tile_rows * lanes;
            if (tile_px0 >= hw)
                break;
            /* Interior tiles fit entirely inside h*w: skip the per-pixel
             * bounds check (only the last tile can be ragged). */
            const int fits =
                tile_px0 + (size_t)tile_rows * lanes <= hw;
            /* Word rows of this tile: w0 = bytes of rows [0, blk),
             * w1 = [blk, 2blk), w2 = [2blk, 3blk); little-endian i32, so
             * byte b of word row r, lane l sits at
             * ((t*3blk + r) * lanes + l) * 4 + b. */
            for (unsigned int j = 0; j < blk; j++) {
                const unsigned char *w0 =
                    wb + (((t * 3) * blk + j) * lanes) * 4;
                const unsigned char *w1 = w0 + (size_t)blk * lanes * 4;
                const unsigned char *w2 = w1 + (size_t)blk * lanes * 4;
                unsigned char *o0 = out + (tile_px0 + (size_t)j * lanes) * 4;
                unsigned char *o1 = o0 + (size_t)blk * lanes * 4;
                unsigned char *o2 = o1 + (size_t)blk * lanes * 4;
                unsigned char *o3 = o2 + (size_t)blk * lanes * 4;
                if (fits) {
                    for (unsigned int l = 0; l < lanes; l++) {
                        const unsigned char *a = w0 + (size_t)l * 4;
                        const unsigned char *b = w1 + (size_t)l * 4;
                        const unsigned char *c = w2 + (size_t)l * 4;
                        unsigned char *o = o0 + (size_t)l * 4;
                        o[0] = a[0]; o[1] = a[1]; o[2] = a[2]; o[3] = 255;
                        o = o1 + (size_t)l * 4;
                        o[0] = a[3]; o[1] = b[0]; o[2] = b[1]; o[3] = 255;
                        o = o2 + (size_t)l * 4;
                        o[0] = b[2]; o[1] = b[3]; o[2] = c[0]; o[3] = 255;
                        o = o3 + (size_t)l * 4;
                        o[0] = c[1]; o[1] = c[2]; o[2] = c[3]; o[3] = 255;
                    }
                    continue;
                }
                for (unsigned int l = 0; l < lanes; l++) {
                    const unsigned char *a = w0 + (size_t)l * 4;
                    const unsigned char *b = w1 + (size_t)l * 4;
                    const unsigned char *c = w2 + (size_t)l * 4;
                    /* Block g holds pixel (row g*blk + j, lane l). */
                    const unsigned char rgb[4][3] = {
                        {a[0], a[1], a[2]},
                        {a[3], b[0], b[1]},
                        {b[2], b[3], c[0]},
                        {c[1], c[2], c[3]},
                    };
                    for (unsigned int g = 0; g < 4; g++) {
                        const size_t px =
                            tile_px0 + ((size_t)g * blk + j) * lanes + l;
                        if (px >= hw)
                            continue;
                        unsigned char *o = out + px * 4;
                        o[0] = rgb[g][0];
                        o[1] = rgb[g][1];
                        o[2] = rgb[g][2];
                        o[3] = 255;
                    }
                }
            }
        }
    }

done:
    PyBuffer_Release(&words);
    return result;
}

static PyObject *
imagio_unpack_indices_gather(PyObject *self, PyObject *args)
{
    Py_buffer words, palette;
    unsigned int h, w, bits, tile_rows, lanes;
    if (!PyArg_ParseTuple(args, "y*IIIIIy*", &words, &h, &w, &bits,
                          &tile_rows, &lanes, &palette))
        return NULL;

    PyObject *result = NULL;
    const size_t hw = (size_t)h * w;
    if (bits != 2 && bits != 4 && bits != 8 && bits != 16) {
        PyErr_SetString(PyExc_ValueError, "bits must be 2/4/8/16");
        goto done;
    }
    {
        const unsigned int ppw = 32 / bits;
        const unsigned int blk = tile_rows / ppw;
        const unsigned int k = (unsigned int)(palette.len / 4);
        const uint32_t mask = (bits == 32) ? 0xffffffffu
                                           : ((1u << bits) - 1u);
        if (tile_rows == 0 || lanes == 0 || blk * ppw != tile_rows ||
            (size_t)palette.len % 4 != 0 || k == 0 ||
            (size_t)words.len % ((size_t)blk * lanes * 4) != 0) {
            PyErr_SetString(PyExc_ValueError,
                            "bad layout (tile_rows % (32/bits) == 0; RGBA8"
                            " palette; words a whole number of tiles)");
            goto done;
        }
        const size_t n_tiles = (size_t)words.len / ((size_t)blk * lanes * 4);
        if (n_tiles * tile_rows * lanes < hw) {
            PyErr_SetString(PyExc_ValueError, "words too short for h * w");
            goto done;
        }
        /* bytearray output: writable through np.frombuffer, no final
         * PyBytes copy (see unpack_rgb24). */
        result = PyByteArray_FromStringAndSize(NULL, (Py_ssize_t)(hw * 4));
        if (!result)
            goto done;
        unsigned char *out = (unsigned char *)PyByteArray_AS_STRING(result);
        const uint32_t *wk = (const uint32_t *)words.buf;
        const unsigned char *pal = (const unsigned char *)palette.buf;
        /* Palettes are <= 512 RGBA rows: validate indices against a tiny
         * bitmap-free bound by clamping through a 65536-entry guard only
         * when bits == 16; narrower tiers cannot exceed 256 < 2^bits, so
         * a single pre-check of k against 1u << bits suffices there. */
        const int need_check = (k < (bits >= 32 ? 0xffffffffu
                                                : (1u << bits)));
        for (size_t t = 0; t < n_tiles; t++) {
            const size_t tile_px0 = t * tile_rows * lanes;
            if (tile_px0 >= hw)
                break;
            const int fits =
                tile_px0 + (size_t)tile_rows * lanes <= hw;
            for (unsigned int j = 0; j < blk; j++) {
                const uint32_t *row = wk + (t * blk + j) * lanes;
                if (fits && !need_check) {
                    for (unsigned int s = 0; s < ppw; s++) {
                        unsigned char *orow =
                            out +
                            (tile_px0 + ((size_t)s * blk + j) * lanes) * 4;
                        const unsigned int sh = bits * s;
                        for (unsigned int l = 0; l < lanes; l++) {
                            const uint32_t idx = (row[l] >> sh) & mask;
                            memcpy(orow + (size_t)l * 4,
                                   pal + (size_t)idx * 4, 4);
                        }
                    }
                    continue;
                }
                for (unsigned int l = 0; l < lanes; l++) {
                    uint32_t word = row[l];
                    for (unsigned int s = 0; s < ppw; s++) {
                        const size_t px =
                            tile_px0 + ((size_t)s * blk + j) * lanes + l;
                        const uint32_t idx = (word >> (bits * s)) & mask;
                        if (px >= hw)
                            continue;
                        if (idx >= k) {
                            Py_CLEAR(result);
                            PyErr_Format(PyExc_ValueError,
                                         "index %u out of range for %u-color"
                                         " palette",
                                         idx, k);
                            goto done;
                        }
                        memcpy(out + px * 4, pal + (size_t)idx * 4, 4);
                    }
                }
            }
        }
    }

done:
    PyBuffer_Release(&words);
    PyBuffer_Release(&palette);
    return result;
}

static PyObject *
imagio_strip_alpha(PyObject *self, PyObject *args)
{
    /* RGBA8 -> RGB8: the upload-side alpha strip (`api._host_rgb`).
     * numpy's strided `ascontiguousarray(px[..., :3])` runs ~0.6 GB/s
     * (52 ms on a 4K frame — the largest host_prep term in the round-5
     * phase attribution, tools/exp_phases.py); this single-pass byte
     * walk autovectorizes to several GB/s. Returns a bytearray (the
     * caller wraps with np.frombuffer: writable, no extra copy). */
    Py_buffer rgba;
    if (!PyArg_ParseTuple(args, "y*", &rgba))
        return NULL;
    PyObject *result = NULL;
    if ((size_t)rgba.len % 4 != 0) {
        PyErr_SetString(PyExc_ValueError, "buffer length must be 4 * n");
        goto done;
    }
    {
        const size_t n = (size_t)rgba.len / 4;
        result = PyByteArray_FromStringAndSize(NULL, (Py_ssize_t)(n * 3));
        if (!result)
            goto done;
        unsigned char *out = (unsigned char *)PyByteArray_AS_STRING(result);
        const unsigned char *in = (const unsigned char *)rgba.buf;
        for (size_t i = 0; i < n; i++) {
            out[i * 3 + 0] = in[i * 4 + 0];
            out[i * 3 + 1] = in[i * 4 + 1];
            out[i * 3 + 2] = in[i * 4 + 2];
        }
    }
done:
    PyBuffer_Release(&rgba);
    return result;
}

static PyObject *
imagio_set_max_decode_pixels(PyObject *self, PyObject *args)
{
    unsigned long long n;
    if (!PyArg_ParseTuple(args, "K", &n))
        return NULL;
    if (n == 0) {
        PyErr_SetString(PyExc_ValueError, "limit must be positive");
        return NULL;
    }
    size_t old = imagio_max_pixels;
    imagio_max_pixels = (size_t)n;
    return PyLong_FromSize_t(old);
}

static PyObject *
imagio_get_max_decode_pixels(PyObject *self, PyObject *noargs)
{
    (void)noargs;
    return PyLong_FromSize_t(imagio_max_pixels);
}

/* ------------------------------------------------------------------ */

static PyMethodDef imagio_methods[] = {
    {"decode_png", imagio_decode_png, METH_VARARGS,
     "decode_png(data) -> (width, height, rgba_bytes)"},
    {"encode_png", imagio_encode_png, METH_VARARGS,
     "encode_png(width, height, rgba_bytes) -> png_bytes"},
    {"encode_png_indexed", imagio_encode_png_indexed, METH_VARARGS,
     "encode_png_indexed(width, height, rgba_palette, index_bytes) -> png_bytes"},
    {"decode_jpeg", imagio_decode_jpeg, METH_VARARGS,
     "decode_jpeg(data) -> (width, height, rgba_bytes)"},
    {"encode_jpeg", imagio_encode_jpeg, METH_VARARGS,
     "encode_jpeg(width, height, rgba_bytes, quality=90) -> jpeg_bytes"},
    {"encode_gif", imagio_encode_gif, METH_VARARGS,
     "encode_gif(width, height, [(palette, indices[, delay_cs]), ...],"
     " delay_cs=100, loop=True) -> gif_bytes"},
    {"decode_gif", imagio_decode_gif, METH_VARARGS,
     "decode_gif(data) -> (width, height, [rgba_bytes, ...], [delay_cs, ...])"},
    {"unpack_rgb24", imagio_unpack_rgb24, METH_VARARGS,
     "unpack_rgb24(words_i32_buffer, h, w, tile_rows, lanes) ->"
     " rgba_bytearray (inverse of the fused meld kernel's in-kernel RGB"
     " byte pack; accepts any C-contiguous buffer)"},
    {"unpack_indices_gather", imagio_unpack_indices_gather, METH_VARARGS,
     "unpack_indices_gather(words_i32_buffer, h, w, bits, tile_rows, lanes,"
     " palette_rgba_buffer) -> rgba_bytearray (inverse of the in-kernel"
     " index pack, fused with the palette gather)"},
    {"strip_alpha", imagio_strip_alpha, METH_VARARGS,
     "strip_alpha(rgba_bytes) -> bytearray: RGBA8 -> RGB8 byte strip"},
    {"set_max_decode_pixels", imagio_set_max_decode_pixels, METH_VARARGS,
     "set_max_decode_pixels(n) -> previous limit (total decoded pixels per"
     " call; default 512 Mpix)"},
    {"get_max_decode_pixels", imagio_get_max_decode_pixels, METH_NOARGS,
     "get_max_decode_pixels() -> current limit"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef imagio_module = {
    PyModuleDef_HEAD_INIT, "_imagio",
    "Native PNG/JPEG/GIF codec runtime for kmeans_tpu.", -1, imagio_methods};

PyMODINIT_FUNC
PyInit__imagio(void)
{
    return PyModule_Create(&imagio_module);
}
