// Minimal dependency-free PNG writer (RGBA8, stored/uncompressed deflate
// blocks) for fast frame dumps — the native "present to disk" path.
//
// C ABI: int ash_write_png(const char* path, const uint8_t* rgba,
//                          int width, int height)  -> 0 on success

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

uint32_t crc_table[256];
bool crc_init_done = false;

void crc_init() {
  for (uint32_t n = 0; n < 256; ++n) {
    uint32_t c = n;
    for (int k = 0; k < 8; ++k)
      c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc_table[n] = c;
  }
  crc_init_done = true;
}

uint32_t crc32_of(const uint8_t* data, size_t len, uint32_t crc = 0xFFFFFFFFu) {
  if (!crc_init_done) crc_init();
  for (size_t i = 0; i < len; ++i)
    crc = crc_table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return crc;
}

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back((uint8_t)(x >> 24));
  v.push_back((uint8_t)(x >> 16));
  v.push_back((uint8_t)(x >> 8));
  v.push_back((uint8_t)x);
}

void write_chunk(FILE* f, const char type[4], const uint8_t* data, size_t len) {
  uint8_t hdr[8];
  hdr[0] = (uint8_t)(len >> 24);
  hdr[1] = (uint8_t)(len >> 16);
  hdr[2] = (uint8_t)(len >> 8);
  hdr[3] = (uint8_t)len;
  memcpy(hdr + 4, type, 4);
  fwrite(hdr, 1, 8, f);
  if (len) fwrite(data, 1, len, f);
  uint32_t crc = crc32_of((const uint8_t*)type, 4);
  crc = crc32_of(data, len, crc) ^ 0xFFFFFFFFu;
  uint8_t cb[4] = {(uint8_t)(crc >> 24), (uint8_t)(crc >> 16),
                   (uint8_t)(crc >> 8), (uint8_t)crc};
  fwrite(cb, 1, 4, f);
}

}  // namespace

extern "C" int ash_write_png(const char* path, const uint8_t* rgba, int width,
                             int height) {
  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  fwrite(sig, 1, 8, f);

  uint8_t ihdr[13];
  ihdr[0] = (uint8_t)(width >> 24);
  ihdr[1] = (uint8_t)(width >> 16);
  ihdr[2] = (uint8_t)(width >> 8);
  ihdr[3] = (uint8_t)width;
  ihdr[4] = (uint8_t)(height >> 24);
  ihdr[5] = (uint8_t)(height >> 16);
  ihdr[6] = (uint8_t)(height >> 8);
  ihdr[7] = (uint8_t)height;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 6;   // RGBA
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  write_chunk(f, "IHDR", ihdr, 13);

  // raw scanlines with filter byte 0
  const size_t stride = (size_t)width * 4;
  std::vector<uint8_t> raw;
  raw.reserve((stride + 1) * (size_t)height);
  for (int y = 0; y < height; ++y) {
    raw.push_back(0);
    raw.insert(raw.end(), rgba + (size_t)y * stride,
               rgba + (size_t)y * stride + stride);
  }

  // zlib stream with stored (uncompressed) deflate blocks
  std::vector<uint8_t> z;
  z.push_back(0x78);
  z.push_back(0x01);
  size_t pos = 0;
  while (pos < raw.size()) {
    size_t blk = raw.size() - pos;
    if (blk > 65535) blk = 65535;
    bool last = pos + blk == raw.size();
    z.push_back(last ? 1 : 0);
    z.push_back((uint8_t)(blk & 0xFF));
    z.push_back((uint8_t)(blk >> 8));
    z.push_back((uint8_t)(~blk & 0xFF));
    z.push_back((uint8_t)((~blk >> 8) & 0xFF));
    z.insert(z.end(), raw.begin() + pos, raw.begin() + pos + blk);
    pos += blk;
  }
  // adler32
  uint32_t a = 1, b = 0;
  for (uint8_t byte : raw) {
    a = (a + byte) % 65521;
    b = (b + a) % 65521;
  }
  put_be32(z, (b << 16) | a);
  write_chunk(f, "IDAT", z.data(), z.size());
  write_chunk(f, "IEND", nullptr, 0);
  fclose(f);
  return 0;
}
