// BitMagic wire-compatibility validation harness (COMPAT.md §5).
//
// The repo's io/bitmagic.py reconstructs the bm::serializer wire format
// offline (BitMagic is a FetchContent dep absent from the reference
// snapshot and this environment has no network).  This harness makes
// validation a one-command job the moment BitMagic headers are
// available:
//
//   1. python tools/bm_validate.py dump <dir>     # write fixture cases
//   2. g++ -O2 -I $BM_INCLUDE tools/bm_validate.cpp -o /tmp/bmval
//      /tmp/bmval <dir>                           # real-BitMagic pass
//   3. python tools/bm_validate.py check <dir>    # compare both ways
//
// Step 2, per case:
//   - reads case_<n>.pos (u64 LE: size, count, positions...)
//   - builds a bm::bvector<> and serializes it at compression levels
//     3..5 (level 5 is the bmserial default that emits the bienc/digest0
//     opcodes whose layout io/bitmagic.py self-rates medium-LOW)
//     -> case_<n>.bm.lvl<k>.bin
//   - deserializes case_<n>.msweep.bin (this repo's serializer output)
//     and writes the recovered positions -> case_<n>.roundtrip.pos
//
// Step 3 then asserts (a) our deserialize() decodes every bm stream to
// the exact position set and (b) real bm::deserialize recovered our
// streams exactly — wire compatibility in both directions.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "bm.h"
#include "bmserial.h"

static std::vector<uint64_t> read_u64_file(const std::string& path) {
  std::vector<uint64_t> out;
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return out;
  uint64_t v;
  while (std::fread(&v, 8, 1, f) == 1) out.push_back(v);
  std::fclose(f);
  return out;
}

static void write_bytes(const std::string& path, const unsigned char* p, size_t n) {
  FILE* f = std::fopen(path.c_str(), "wb");
  std::fwrite(p, 1, n, f);
  std::fclose(f);
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <fixture-dir>\n", argv[0]);
    return 2;
  }
  std::string dir = argv[1];
  int n_ok = 0;
  for (int ci = 0;; ++ci) {
    char name[64];
    std::snprintf(name, sizeof name, "/case_%d.pos", ci);
    std::vector<uint64_t> raw = read_u64_file(dir + name);
    if (raw.size() < 2) break;  // no more cases
    uint64_t bv_size = raw[0], count = raw[1];

    bm::bvector<> bv;
    bv.set_new_blocks_strat(bm::BM_GAP);  // alignment-writer's strategy
    if (bv_size) bv.resize(bv_size);
    for (uint64_t k = 0; k < count; ++k) bv.set(raw[2 + k]);
    bv.optimize();

    for (int lvl = 3; lvl <= 5; ++lvl) {
      bm::serializer<bm::bvector<>> ser;
      ser.set_compression_level(lvl);
      bm::serializer<bm::bvector<>>::buffer buf;
      ser.serialize(bv, buf);
      char out[96];
      std::snprintf(out, sizeof out, "/case_%d.bm.lvl%d.bin", ci, lvl);
      write_bytes(dir + out, buf.data(), buf.size());
    }

    // Round-trip OUR serializer's stream through real bm::deserialize.
    std::snprintf(name, sizeof name, "/case_%d.msweep.bin", ci);
    FILE* f = std::fopen((dir + name).c_str(), "rb");
    if (f) {
      std::fseek(f, 0, SEEK_END);
      long sz = std::ftell(f);
      std::fseek(f, 0, SEEK_SET);
      std::vector<unsigned char> sbuf(sz);
      if (std::fread(sbuf.data(), 1, sz, f) != (size_t)sz) { std::fclose(f); return 3; }
      std::fclose(f);
      bm::bvector<> rt;
      bm::deserialize(rt, sbuf.data());
      std::vector<uint64_t> pos;
      pos.push_back(rt.size());
      pos.push_back(rt.count());
      bm::bvector<>::enumerator en = rt.first();
      for (; en.valid(); ++en) pos.push_back(*en);
      std::snprintf(name, sizeof name, "/case_%d.roundtrip.pos", ci);
      FILE* o = std::fopen((dir + name).c_str(), "wb");
      std::fwrite(pos.data(), 8, pos.size(), o);
      std::fclose(o);
    }
    ++n_ok;
  }
  std::printf("bm_validate: processed %d cases\n", n_ok);
  return n_ok > 0 ? 0 : 1;
}
