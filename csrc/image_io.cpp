// Native image IO: Radiance RGBE (.hdr) reader/writer and a PNG writer.
//
// TPU-native counterpart of the reference's stb_image dependencies:
// stbi_loadf for HDR environments (include/shader.hpp:131) and the vendored
// stb_image_write.h (include/PnRT.hpp:7-9, never actually called).  Written
// from scratch: RGBE per the Radiance picture format (flat + adaptive RLE
// scanlines), PNG with stored-deflate blocks (no zlib dependency).
//
// ABI: plain C functions returning 0 on success, loaded via ctypes
// (pnraytracing_tpu/io/native.py).  Semantics mirror the pure-Python
// implementations in pnraytracing_tpu/io/hdr.py and utils/image.py so the
// two paths are interchangeable and cross-tested.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

bool read_file(const char* path, std::vector<uint8_t>& out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (n < 0) { std::fclose(f); return false; }
    out.resize(static_cast<size_t>(n));
    size_t got = n ? std::fread(out.data(), 1, static_cast<size_t>(n), f) : 0;
    std::fclose(f);
    return got == static_cast<size_t>(n);
}

// Parse the HDR header; returns byte offset of pixel data or -1.
long parse_hdr_header(const std::vector<uint8_t>& data, int* h, int* w) {
    const char* magic1 = "#?RADIANCE";
    const char* magic2 = "#?RGBE";
    if (data.size() < 10) return -1;
    if (std::memcmp(data.data(), magic1, 10) != 0 &&
        std::memcmp(data.data(), magic2, 6) != 0)
        return -1;
    size_t pos = 0;
    // header lines until blank line
    for (;;) {
        size_t eol = pos;
        while (eol < data.size() && data[eol] != '\n') ++eol;
        if (eol >= data.size()) return -1;
        size_t len = eol - pos;
        pos = eol + 1;
        if (len == 0) break;  // blank line ends the header
    }
    // resolution line: "-Y H +X W"
    size_t eol = pos;
    while (eol < data.size() && data[eol] != '\n') ++eol;
    if (eol >= data.size()) return -1;
    std::string res(reinterpret_cast<const char*>(data.data() + pos), eol - pos);
    int hh = 0, ww = 0;
    if (std::sscanf(res.c_str(), "-Y %d +X %d", &hh, &ww) != 2) return -1;
    *h = hh;
    *w = ww;
    return static_cast<long>(eol + 1);
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- HDR read
int pnrt_hdr_read_size(const char* path, int* h, int* w) {
    std::vector<uint8_t> data;
    if (!read_file(path, data)) return 1;
    return parse_hdr_header(data, h, w) < 0 ? 2 : 0;
}

// out: [h*w*3] float32, top row first.
int pnrt_hdr_read(const char* path, float* out) {
    std::vector<uint8_t> data;
    if (!read_file(path, data)) return 1;
    int h = 0, w = 0;
    long off = parse_hdr_header(data, &h, &w);
    if (off < 0) return 2;
    const uint8_t* buf = data.data() + off;
    size_t n = data.size() - static_cast<size_t>(off);
    std::vector<uint8_t> rgbe(static_cast<size_t>(h) * w * 4, 0);

    size_t i = 0;
    for (int y = 0; y < h; ++y) {
        uint8_t* row = rgbe.data() + static_cast<size_t>(y) * w * 4;
        if (w >= 8 && w < 32768 && i + 4 <= n && buf[i] == 2 && buf[i + 1] == 2 &&
            ((static_cast<int>(buf[i + 2]) << 8) | buf[i + 3]) == w) {
            // adaptive RLE scanline: four component planes
            i += 4;
            for (int c = 0; c < 4; ++c) {
                int x = 0;
                while (x < w) {
                    if (i >= n) return 3;
                    int count = buf[i++];
                    if (count > 128) {  // run
                        if (i >= n || x + (count - 128) > w) return 3;
                        uint8_t v = buf[i++];
                        for (int k = 0; k < count - 128; ++k) row[(x + k) * 4 + c] = v;
                        x += count - 128;
                    } else {  // literal
                        if (i + count > n || x + count > w) return 3;
                        for (int k = 0; k < count; ++k) row[(x + k) * 4 + c] = buf[i + k];
                        i += count;
                        x += count;
                    }
                }
            }
        } else {
            // flat scanline with old-style run-length (255,255,255,rep)
            int x = 0;
            while (x < w) {
                if (i + 4 > n) return 3;
                const uint8_t* px = buf + i;
                if (px[0] == 255 && px[1] == 255 && px[2] == 255 && x > 0) {
                    int rep = px[3];
                    if (x + rep > w) return 3;
                    for (int k = 0; k < rep; ++k)
                        std::memcpy(row + (x + k) * 4, row + (x - 1) * 4, 4);
                    x += rep;
                } else {
                    std::memcpy(row + x * 4, px, 4);
                    x += 1;
                }
                i += 4;
            }
        }
    }

    // decode RGBE -> float radiance (hdr.py::_decode_rgbe)
    size_t npx = static_cast<size_t>(h) * w;
    for (size_t p = 0; p < npx; ++p) {
        int e = rgbe[p * 4 + 3];
        float scale = (e == 0) ? 0.0f : std::ldexp(1.0f, e - 128 - 8);
        out[p * 3 + 0] = rgbe[p * 4 + 0] * scale;
        out[p * 3 + 1] = rgbe[p * 4 + 1] * scale;
        out[p * 3 + 2] = rgbe[p * 4 + 2] * scale;
    }
    return 0;
}

// --------------------------------------------------------------- HDR write
// rle != 0 writes adaptive-RLE scanlines (the stb/Photoshop format); 0
// writes flat RGBE like hdr.py::write_hdr.
int pnrt_hdr_write(const char* path, const float* img, int h, int w, int rle) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return 1;
    std::fprintf(f, "#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n-Y %d +X %d\n", h, w);

    std::vector<uint8_t> row(static_cast<size_t>(w) * 4);
    std::vector<uint8_t> plane(static_cast<size_t>(w));
    for (int y = 0; y < h; ++y) {
        const float* src = img + static_cast<size_t>(y) * w * 3;
        for (int x = 0; x < w; ++x) {
            float r = src[x * 3], g = src[x * 3 + 1], b = src[x * 3 + 2];
            float m = r > g ? r : g;
            m = m > b ? m : b;
            if (m <= 1e-32f) {
                std::memset(row.data() + x * 4, 0, 4);
                continue;
            }
            int e;
            std::frexp(m, &e);  // m = f * 2^e, f in [0.5, 1)
            double sc = std::ldexp(256.0, -e);
            auto q = [&](float v) -> uint8_t {
                double t = v * sc;
                if (t < 0) t = 0;
                if (t > 255) t = 255;
                return static_cast<uint8_t>(t);
            };
            row[x * 4 + 0] = q(r);
            row[x * 4 + 1] = q(g);
            row[x * 4 + 2] = q(b);
            row[x * 4 + 3] = static_cast<uint8_t>(e + 128);
        }
        if (!rle || w < 8 || w >= 32768) {
            std::fwrite(row.data(), 1, row.size(), f);
            continue;
        }
        // adaptive RLE: marker then four component planes
        uint8_t hdr4[4] = {2, 2, static_cast<uint8_t>(w >> 8),
                           static_cast<uint8_t>(w & 0xff)};
        std::fwrite(hdr4, 1, 4, f);
        for (int c = 0; c < 4; ++c) {
            for (int x = 0; x < w; ++x) plane[x] = row[x * 4 + c];
            int x = 0;
            while (x < w) {
                // find next run of >= 4 identical bytes
                int run_start = x;
                int run_len = 0;
                while (run_start < w) {
                    run_len = 1;
                    while (run_start + run_len < w && run_len < 127 &&
                           plane[run_start + run_len] == plane[run_start])
                        ++run_len;
                    if (run_len >= 4) break;
                    run_start += run_len;
                }
                if (run_start >= w) run_start = w;
                // literals up to the run
                int lit = run_start - x;
                while (lit > 0) {
                    int k = lit > 128 ? 128 : lit;
                    uint8_t cnt = static_cast<uint8_t>(k);
                    std::fwrite(&cnt, 1, 1, f);
                    std::fwrite(plane.data() + x, 1, k, f);
                    x += k;
                    lit -= k;
                }
                if (run_start < w && run_len >= 4) {
                    uint8_t cnt = static_cast<uint8_t>(128 + run_len);
                    std::fwrite(&cnt, 1, 1, f);
                    std::fwrite(plane.data() + run_start, 1, 1, f);
                    x = run_start + run_len;
                }
            }
        }
    }
    std::fclose(f);
    return 0;
}

// --------------------------------------------------------------- PNG write
namespace {

uint32_t crc_table[256];
bool crc_init_done = false;

void crc_init() {
    if (crc_init_done) return;
    for (uint32_t i = 0; i < 256; ++i) {
        uint32_t c = i;
        for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
        crc_table[i] = c;
    }
    crc_init_done = true;
}

uint32_t crc32_of(const uint8_t* p, size_t n, uint32_t crc = 0xFFFFFFFFu) {
    crc_init();
    for (size_t i = 0; i < n; ++i) crc = crc_table[(crc ^ p[i]) & 0xff] ^ (crc >> 8);
    return crc;
}

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back(static_cast<uint8_t>(x >> 24));
    v.push_back(static_cast<uint8_t>(x >> 16));
    v.push_back(static_cast<uint8_t>(x >> 8));
    v.push_back(static_cast<uint8_t>(x));
}

void write_chunk(FILE* f, const char type[4], const std::vector<uint8_t>& data) {
    std::vector<uint8_t> head;
    put_be32(head, static_cast<uint32_t>(data.size()));
    std::fwrite(head.data(), 1, 4, f);
    std::fwrite(type, 1, 4, f);
    if (!data.empty()) std::fwrite(data.data(), 1, data.size(), f);
    uint32_t crc = crc32_of(reinterpret_cast<const uint8_t*>(type), 4);
    crc = crc32_of(data.data(), data.size(), crc);
    crc ^= 0xFFFFFFFFu;
    std::vector<uint8_t> tail;
    put_be32(tail, crc);
    std::fwrite(tail.data(), 1, 4, f);
}

}  // namespace

// rgb: [h*w*3] uint8, top row first.  8-bit truecolor, stored (uncompressed)
// deflate blocks inside a valid zlib stream — no compression dependency.
int pnrt_png_write(const char* path, const uint8_t* rgb, int h, int w) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return 1;
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    std::fwrite(sig, 1, 8, f);

    std::vector<uint8_t> ihdr;
    put_be32(ihdr, static_cast<uint32_t>(w));
    put_be32(ihdr, static_cast<uint32_t>(h));
    ihdr.push_back(8);   // bit depth
    ihdr.push_back(2);   // color type: truecolor
    ihdr.push_back(0);   // compression
    ihdr.push_back(0);   // filter
    ihdr.push_back(0);   // interlace
    write_chunk(f, "IHDR", ihdr);

    // raw scanlines: filter byte 0 + row
    size_t stride = static_cast<size_t>(w) * 3;
    std::vector<uint8_t> raw;
    raw.reserve(static_cast<size_t>(h) * (stride + 1));
    for (int y = 0; y < h; ++y) {
        raw.push_back(0);
        raw.insert(raw.end(), rgb + y * stride, rgb + (y + 1) * stride);
    }

    // zlib stream with stored deflate blocks
    std::vector<uint8_t> idat;
    idat.push_back(0x78);
    idat.push_back(0x01);
    size_t pos = 0;
    do {
        size_t chunk = raw.size() - pos;
        if (chunk > 65535) chunk = 65535;
        bool final = pos + chunk == raw.size();
        idat.push_back(final ? 1 : 0);  // BFINAL, BTYPE=00
        idat.push_back(static_cast<uint8_t>(chunk & 0xff));
        idat.push_back(static_cast<uint8_t>(chunk >> 8));
        idat.push_back(static_cast<uint8_t>(~chunk & 0xff));
        idat.push_back(static_cast<uint8_t>((~chunk >> 8) & 0xff));
        idat.insert(idat.end(), raw.begin() + pos, raw.begin() + pos + chunk);
        pos += chunk;
    } while (pos < raw.size());
    // adler32 of raw data
    uint32_t a = 1, b = 0;
    for (uint8_t byte : raw) {
        a = (a + byte) % 65521;
        b = (b + a) % 65521;
    }
    put_be32(idat, (b << 16) | a);
    write_chunk(f, "IDAT", idat);
    write_chunk(f, "IEND", {});
    std::fclose(f);
    return 0;
}

}  // extern "C"
