// Native PNM (PGM/PPM) codec: header parse + ascii-P2 pixel decode.
//
// Reference parity: pnmio.py (SURVEY.md section 2.1 "PNM I/O"). The
// Python reader in utils/io.py parses headers one byte at a time to get
// netpbm comment semantics right; at serving rates (thousands of frames
// per second through serving.serve_stream) that per-frame Python cost is
// the ingest bottleneck, so the header/ascii parsing runs here and the
// binary payload becomes a zero-copy numpy view. Semantics are identical
// to the Python path (tested equal in tests/test_native.py), including:
//   * '#' starts a comment running to end-of-line; a '#' abutting a
//     token ("24# c") terminates that token;
//   * exactly the whitespace byte (or comment line) that terminates the
//     maxval token separates header from binary payload;
//   * ascii (P2) pixel data is whitespace-split with NO comment
//     handling, values must be decimal in 0..255 (matching the Python
//     fallback's int()/uint8-cast error behavior).
//
// Build: compiled into libpft_native.so together with the other
// native/*.cpp by pyfeaturetrack_tpu/utils/native.py.

#include <cstdint>

namespace {

constexpr int64_t kErrTruncated = -1;  // EOF inside header
constexpr int64_t kErrBadMagic = -2;   // not P2/P5/P6
constexpr int64_t kErrBadToken = -3;   // non-numeric or out-of-range value

// Reads one whitespace-delimited token, skipping '#' comments, starting
// at *pos. Token bytes land in tok[0..cap); returns token length (>0),
// kErrTruncated at EOF with no token, or the token length so far when
// EOF hits mid-token (matching the Python reader, which returns a
// partial final token). *pos advances past the byte that terminated the
// token (including the full comment line when '#' terminated it).
int64_t next_token(const uint8_t* buf, int64_t len, int64_t* pos,
                   uint8_t* tok, int64_t cap) {
  int64_t n = 0;
  while (*pos < len) {
    uint8_t c = buf[(*pos)++];
    if (c == '#') {
      while (*pos < len && buf[(*pos)++] != '\n') {
      }
      if (n > 0) return n;
      continue;
    }
    if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\v' ||
        c == '\f') {
      if (n > 0) return n;
      continue;
    }
    if (n < cap) tok[n] = c;
    ++n;
  }
  return n > 0 ? n : kErrTruncated;
}

// Decimal parse of a header token -> non-negative int64, or kErrBadToken.
int64_t parse_uint(const uint8_t* tok, int64_t n) {
  if (n <= 0 || n > 18) return kErrBadToken;
  int64_t v = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (tok[i] < '0' || tok[i] > '9') return kErrBadToken;
    v = v * 10 + (tok[i] - '0');
  }
  return v;
}

}  // namespace

extern "C" {

// Parses a PNM header from buf[0..len). On success returns 0 and fills
// out[5] = {format digit (2|5|6), width, height, maxval, data offset}.
// On failure returns kErrTruncated / kErrBadMagic / kErrBadToken.
int64_t pft_pnm_parse_header(const uint8_t* buf, int64_t len,
                             int64_t* out) {
  int64_t pos = 0;
  uint8_t tok[32];
  int64_t n = next_token(buf, len, &pos, tok, sizeof(tok));
  if (n == kErrTruncated) return kErrTruncated;
  if (n != 2 || tok[0] != 'P' ||
      (tok[1] != '2' && tok[1] != '5' && tok[1] != '6'))
    return kErrBadMagic;
  out[0] = tok[1] - '0';
  for (int f = 1; f <= 3; ++f) {
    n = next_token(buf, len, &pos, tok, sizeof(tok));
    if (n == kErrTruncated) return kErrTruncated;
    int64_t v = parse_uint(tok, n);
    if (v < 0) return kErrBadToken;
    out[f] = v;
  }
  out[4] = pos;
  return 0;
}

// Decodes whitespace-separated ascii grey values (P2 payload) from
// buf[0..len) into pix[0..npix). Mirrors the Python fallback exactly:
// bytes are split on whitespace (no comment handling inside pixel
// data), every token must be a decimal integer in 0..255. Returns the
// number of values decoded (caller checks == npix for truncation), or
// kErrBadToken on a malformed/out-of-range token among the first npix.
int64_t pft_pnm_decode_ascii(const uint8_t* buf, int64_t len,
                             uint8_t* pix, int64_t npix) {
  int64_t pos = 0, count = 0;
  while (count < npix) {
    while (pos < len && (buf[pos] == ' ' || buf[pos] == '\t' ||
                         buf[pos] == '\n' || buf[pos] == '\r' ||
                         buf[pos] == '\v' || buf[pos] == '\f'))
      ++pos;
    if (pos >= len) break;
    int64_t v = 0, digits = 0;
    bool bad = false;
    while (pos < len && buf[pos] != ' ' && buf[pos] != '\t' &&
           buf[pos] != '\n' && buf[pos] != '\r' && buf[pos] != '\v' &&
           buf[pos] != '\f') {
      uint8_t c = buf[pos++];
      if (c < '0' || c > '9' || v > 255) {
        bad = true;
      } else {
        v = v * 10 + (c - '0');
        ++digits;
      }
    }
    if (bad || digits == 0 || v > 255) return kErrBadToken;
    pix[count++] = static_cast<uint8_t>(v);
  }
  return count;
}

}  // extern "C"
