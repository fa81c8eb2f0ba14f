// Stage-level timing of the native ingest engine: parse vs encode vs pack,
// measured in-process (no ring, no threads) by #including the engine TU.
// Usage: g++ -O3 -march=native -std=c++17 -pthread -o /tmp/stage_bench \
//          bench/native_stage_bench.cpp -lz && /tmp/stage_bench <fastq>
#include "../shark_tpu/native/shark_native.cpp"

#include <chrono>

int main(int argc, char** argv) {
  const char* path = argc > 1 ? argv[1] : "bench/.cache/reads.fq";
  int B = argc > 2 ? atoi(argv[2]) : 65536, L = 104;
  using clk = std::chrono::steady_clock;
  auto secs = [](clk::time_point a, clk::time_point b) {
    return std::chrono::duration<double>(b - a).count();
  };

  for (int pass = 0; pass < 3; pass++) {
    Stream s;
    s.batch_size = B;
    s.max_len = L;
    s.pack_mode = true;
    s.f1 = new FastxReader(path);
    Batch b;
    double t_parse = 0, t_enc = 0, t_pack = 0;
    long n_total = 0;
    while (true) {
      auto t0 = clk::now();
      int n = parse_batch(&s, b);
      auto t1 = clk::now();
      t_parse += secs(t0, t1);
      if (n <= 0) break;
      n_total += n;
      s.pack_mode = false;
      std::string err;
      encode_batch_rows(&s, b, err);
      auto t2 = clk::now();
      t_enc += secs(t1, t2);
      // pack only (re-run encode path with pack on, but time just pack)
      b.packed.resize((size_t)B * (L / 4));
      b.vmask.resize((size_t)B * (L / 8));
      for (int i = 0; i < b.n; i++)
        pack_row(b.codes.data() + (size_t)i * L, L,
                 b.packed.data() + (size_t)i * (L / 4),
                 b.vmask.data() + (size_t)i * (L / 8));
      auto t3 = clk::now();
      t_pack += secs(t2, t3);
      s.pack_mode = true;
    }
    delete s.f1;
    s.f1 = nullptr;
    double tot = t_parse + t_enc + t_pack;
    printf(
        "pass %d: %ld reads  parse %.3fs (%.1fM/s)  encode %.3fs (%.1fM/s)  "
        "pack %.3fs (%.1fM/s)  serial-total %.3fs (%.1fM/s)\n",
        pass, n_total, t_parse, n_total / t_parse / 1e6, t_enc,
        n_total / t_enc / 1e6, t_pack, n_total / t_pack / 1e6, tot,
        n_total / tot / 1e6);
  }
  return 0;
}
