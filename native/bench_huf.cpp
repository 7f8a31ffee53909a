// Micro-harness for the Huffman literal decoder: feeds real literal
// sections (dumped by the session tooling) through decode_literals_c and
// prints ns/byte.  Not part of the shipped library.
#include "zstdtpu_core.cpp"
#include <chrono>
#include <cstdio>
#include <vector>

int main(int argc, char** argv) {
    FILE* f = fopen(argc > 1 ? argv[1] : "/tmp/huf_sections.bin", "rb");
    if (!f) { perror("open"); return 1; }
    uint32_t n;
    fread(&n, 4, 1, f);
    std::vector<std::vector<uint8_t>> secs(n);
    for (uint32_t i = 0; i < n; i++) {
        uint32_t len; fread(&len, 4, 1, f);
        secs[i].resize(len + 32);       // slack for in-place padded reads
        fread(secs[i].data() + 16, 1, len, f);   // 16B pad in front
        secs[i].resize(len + 16);
    }
    fclose(f);
    codec_init();
    EntropyStateC* ent = (EntropyStateC*)calloc(1, sizeof(EntropyStateC));
    uint8_t* lit = (uint8_t*)malloc((1 << 17) + 64);
    int64_t total = 0;
    double best = 1e18;
    for (int rep = 0; rep < 30; rep++) {
        total = 0;
        auto t0 = std::chrono::steady_clock::now();
        for (auto& s : secs) {
            ent->huf.valid = false;
            ent->huf.x2_valid = false;
            int64_t ls = 0;
            int64_t c = decode_literals_c(s.data() + 16, (int64_t)s.size() - 16,
                                          ent, lit, &ls);
            if (c < 0) { fprintf(stderr, "decode failed\n"); return 1; }
            total += ls;
        }
        auto t1 = std::chrono::steady_clock::now();
        double ns = std::chrono::duration<double, std::nano>(t1 - t0).count();
        if (ns < best) best = ns;
    }
    printf("decoded %lld literal bytes: %.3f ns/byte (best of 30)\n",
           (long long)total, best / total);
    return 0;
}
