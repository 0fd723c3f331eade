// Native host runtime kernels for the TPU GNSS framework.
//
// Reference parity: the host-side C cores of the reference —
//   * sample unpacking / type conversion (data_type_adapter adapters and the
//     volk_gnsssdr type-convert kernels): interleaved int8/int16 IQ ->
//     planar float32 ready for device transfer, vectorizable by the
//     compiler, no Python loop in the ingest hot path.
//   * Viterbi K=7 rate-1/2 decoder (libswiftcnav viterbi27.c and
//     telemetry_decoder/libs/viterbi_decoder.cc): used by GPS CNAV (L2C/L5)
//     and Galileo I/NAV-F/NAV FEC.
//   * CRC-24Q (edc.c) for CNAV/INAV message integrity.
//
// Build: make -C native   (produces libgnss_native.so, loaded via ctypes)

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------- ingest --

// Interleaved int16 I/Q -> planar float32 [n][2]
void unpack_ishort_planar(const int16_t* in, float* out, int64_t n_samples) {
  for (int64_t i = 0; i < n_samples; ++i) {
    out[2 * i] = static_cast<float>(in[2 * i]);
    out[2 * i + 1] = static_cast<float>(in[2 * i + 1]);
  }
}

// Interleaved int8 I/Q -> planar float32 [n][2]
void unpack_ibyte_planar(const int8_t* in, float* out, int64_t n_samples) {
  for (int64_t i = 0; i < n_samples; ++i) {
    out[2 * i] = static_cast<float>(in[2 * i]);
    out[2 * i + 1] = static_cast<float>(in[2 * i + 1]);
  }
}

// Real int8/int16 -> planar float32 with zero Q
void unpack_byte_planar(const int8_t* in, float* out, int64_t n_samples) {
  for (int64_t i = 0; i < n_samples; ++i) {
    out[2 * i] = static_cast<float>(in[i]);
    out[2 * i + 1] = 0.0f;
  }
}

void unpack_short_planar(const int16_t* in, float* out, int64_t n_samples) {
  for (int64_t i = 0; i < n_samples; ++i) {
    out[2 * i] = static_cast<float>(in[i]);
    out[2 * i + 1] = 0.0f;
  }
}

// 2-bit packed sample unpack (two_bit_packed_file_signal_source /
// unpack_2bit_samples.cc): each byte holds 4 samples, sign+magnitude
// mapping {00,01,10,11} -> {+1,+3,-1,-3}
void unpack_2bit_planar(const uint8_t* in, float* out, int64_t n_bytes,
                        int big_endian_items) {
  static const float lut[4] = {1.0f, 3.0f, -1.0f, -3.0f};
  for (int64_t b = 0; b < n_bytes; ++b) {
    uint8_t v = in[b];
    for (int k = 0; k < 4; ++k) {
      int shift = big_endian_items ? (6 - 2 * k) : (2 * k);
      out[4 * b + k] = lut[(v >> shift) & 0x3];
    }
  }
}

// --------------------------------------------------------------- viterbi --

// K=7, rate 1/2 convolutional decoder (polynomials G1=0171, G2=0133 octal,
// the GPS CNAV / Galileo I/NAV code).  Soft-decision inputs in [0,255]
// (128 = erasure).  Simple full-trellis implementation sized for the short
// GNSS frames (<= a few thousand symbols).
static inline int parity6(uint32_t x) {
  x ^= x >> 16;
  x ^= x >> 8;
  x ^= x >> 4;
  x &= 0xF;
  return (0x6996 >> x) & 1;
}

// Decode n_bits data bits from 2*n_bits soft symbols; returns path metric.
// out_bits must hold n_bits entries (0/1).
//
// Convention: state s = last 6 input bits, newest in the MSB (bit 5).
// Input `in` forms the 7-bit encoder register reg = (in << 6) | s, the two
// output symbols are parity(reg & G1/2), and the next state is
// (in << 5) | (s >> 1).
int64_t viterbi27_decode(const uint8_t* soft_syms, int64_t n_bits,
                         uint8_t* out_bits, int g1_poly, int g2_poly) {
  const int NS = 64;  // 2^(K-1)
  int64_t* pm = new int64_t[NS];
  int64_t* pm_next = new int64_t[NS];
  // back[ns][t]: bit0 = LSB of predecessor state, bit1 = input bit
  uint8_t* back = new uint8_t[NS * n_bits];
  const int64_t INF = INT64_C(1) << 60;
  for (int s = 0; s < NS; ++s) pm[s] = (s == 0) ? 0 : INF;

  for (int64_t t = 0; t < n_bits; ++t) {
    uint8_t s0 = soft_syms[2 * t], s1 = soft_syms[2 * t + 1];
    for (int ns = 0; ns < NS; ++ns) pm_next[ns] = INF;
    for (int s = 0; s < NS; ++s) {
      if (pm[s] >= INF) continue;
      for (int in = 0; in < 2; ++in) {
        uint32_t reg = (static_cast<uint32_t>(in) << 6) | s;
        int ns_ = (in << 5) | (s >> 1);
        uint8_t o1 = parity6(reg & g1_poly) ? 255 : 0;
        uint8_t o2 = parity6(reg & g2_poly) ? 255 : 0;
        int64_t m = pm[s]
            + (o1 > s0 ? o1 - s0 : s0 - o1)
            + (o2 > s1 ? o2 - s1 : s1 - o2);
        if (m < pm_next[ns_]) {
          pm_next[ns_] = m;
          back[ns_ * n_bits + t] =
              static_cast<uint8_t>((s & 1) | (in << 1));
        }
      }
    }
    std::memcpy(pm, pm_next, NS * sizeof(int64_t));
  }
  int best = 0;
  for (int s = 1; s < NS; ++s)
    if (pm[s] < pm[best]) best = s;
  int64_t metric = pm[best];
  // traceback: predecessor of ns is ((ns & 31) << 1) | stored_lsb
  int s = best;
  for (int64_t t = n_bits - 1; t >= 0; --t) {
    uint8_t b = back[s * n_bits + t];
    out_bits[t] = static_cast<uint8_t>((b >> 1) & 1);
    s = ((s & 31) << 1) | (b & 1);
  }
  delete[] pm;
  delete[] pm_next;
  delete[] back;
  return metric;
}

// ----------------------------------------------------------------- crc24 --

// CRC-24Q (RTCM/CNAV), polynomial 0x1864CFB
uint32_t crc24q(const uint8_t* bytes, int64_t n) {
  uint32_t crc = 0;
  for (int64_t i = 0; i < n; ++i) {
    crc ^= static_cast<uint32_t>(bytes[i]) << 16;
    for (int b = 0; b < 8; ++b) {
      crc <<= 1;
      if (crc & 0x1000000) crc ^= 0x1864CFB;
    }
  }
  return crc & 0xFFFFFF;
}

}  // extern "C"
