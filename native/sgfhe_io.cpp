// Native IO codec for sgfhe_tpu: the serialization hot loops (bit packing /
// unpacking of ciphertext wire formats, reference src/fhe.jl:293-301 and
// :375-383 encodings) plus a CRC32 integrity check for the npz-independent
// wire container. The reference ships no native code (SURVEY.md §2.1); this
// is the production-serving IO path of the TPU framework — host-side, so
// plain C++ (device compute is Pallas).
//
// Build: make -C native   ->  libsgfhe_io.so ; loaded via ctypes
// (sgfhe_tpu/native.py) with a numpy fallback when absent.

#include <cstdint>
#include <cstddef>
#include <cstring>

extern "C" {

// Pack n_bits little-endian bits (one byte per bit in `bits`, values 0/1)
// into ceil(n_bits/8) bytes. Matches numpy packbits(bitorder="little").
void sgfhe_packbits(const uint8_t* bits, size_t n_bits, uint8_t* out) {
  size_t n_bytes = (n_bits + 7) / 8;
  std::memset(out, 0, n_bytes);
  size_t full = n_bits / 8;
  for (size_t i = 0; i < full; ++i) {
    const uint8_t* b = bits + 8 * i;
    out[i] = (uint8_t)((b[0] & 1) | ((b[1] & 1) << 1) | ((b[2] & 1) << 2) |
                       ((b[3] & 1) << 3) | ((b[4] & 1) << 4) |
                       ((b[5] & 1) << 5) | ((b[6] & 1) << 6) |
                       ((b[7] & 1) << 7));
  }
  for (size_t j = 8 * full; j < n_bits; ++j)
    out[full] |= (uint8_t)((bits[j] & 1) << (j - 8 * full));
}

// Inverse of sgfhe_packbits.
void sgfhe_unpackbits(const uint8_t* bytes, size_t n_bits, uint8_t* out) {
  for (size_t j = 0; j < n_bits; ++j)
    out[j] = (bytes[j / 8] >> (j % 8)) & 1;
}

// Pack rows of w-bit unsigned integers (uint32 input) into a dense
// little-endian bitstream: value v occupies bits [i*w, (i+1)*w).
void sgfhe_pack_uint(const uint32_t* vals, size_t count, unsigned width,
                     uint8_t* out) {
  size_t n_bits = count * width;
  std::memset(out, 0, (n_bits + 7) / 8);
  for (size_t i = 0; i < count; ++i) {
    uint64_t v = vals[i] & ((width >= 32) ? 0xFFFFFFFFull
                                          : ((1ull << width) - 1));
    size_t bit = i * width;
    size_t byte = bit / 8;
    unsigned off = (unsigned)(bit % 8);
    uint64_t cur = v << off;
    for (unsigned k = 0; cur != 0 || k == 0; ++k) {
      out[byte + k] |= (uint8_t)(cur & 0xFF);
      cur >>= 8;
      if (k > 8) break;
    }
  }
}

// Inverse of sgfhe_pack_uint. Never reads past ceil(count*width/8) bytes.
void sgfhe_unpack_uint(const uint8_t* bytes, size_t count, unsigned width,
                       uint32_t* out) {
  uint64_t mask = (width >= 32) ? 0xFFFFFFFFull : ((1ull << width) - 1);
  size_t n_bytes = (count * width + 7) / 8;
  for (size_t i = 0; i < count; ++i) {
    size_t bit = i * width;
    size_t byte = bit / 8;
    unsigned off = (unsigned)(bit % 8);
    uint64_t acc = 0;
    unsigned need = (off + width + 7) / 8;
    for (unsigned k = 0; k < need && byte + k < n_bytes; ++k)
      acc |= (uint64_t)bytes[byte + k] << (8 * k);
    out[i] = (uint32_t)((acc >> off) & mask);
  }
}

// CRC32 (IEEE 802.3, reflected 0xEDB88320), table-free bitwise variant —
// wire-format integrity checks; not a hot path per byte count.
uint32_t sgfhe_crc32(const uint8_t* data, size_t len, uint32_t seed) {
  uint32_t crc = ~seed;
  for (size_t i = 0; i < len; ++i) {
    crc ^= data[i];
    for (int k = 0; k < 8; ++k)
      crc = (crc >> 1) ^ (0xEDB88320u & (~(crc & 1u) + 1u));
  }
  return ~crc;
}

}  // extern "C"
