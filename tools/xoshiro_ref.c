/* Independent derivation of rand_xoshiro Xoshiro128Plus seed-0 stream,
 * written directly from the published algorithms:
 *  - rand_core seed_from_u64 = SplitMix64 (Steele et al. 2014 constants)
 *  - xoshiro128+ (Blackman & Vigna 2018)
 *  - rand Standard f32: top 24 bits * 2^-24
 */
#include <stdio.h>
#include <stdint.h>

static uint64_t sm_state;
static uint64_t splitmix64(void) {
    sm_state += 0x9E3779B97F4A7C15ULL;
    uint64_t z = sm_state;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

static uint32_t s[4];
static uint32_t rotl(uint32_t x, int k) { return (x << k) | (x >> (32 - k)); }
static uint32_t next(void) {
    uint32_t result = s[0] + s[3];
    uint32_t t = s[1] << 9;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 11);
    return result;
}

int main(void) {
    sm_state = 0; /* seed_from_u64(0) */
    uint64_t a = splitmix64(), b = splitmix64();
    /* from_seed fills 16 bytes little-endian: a's low u32, a's high, b's... */
    s[0] = (uint32_t)a; s[1] = (uint32_t)(a >> 32);
    s[2] = (uint32_t)b; s[3] = (uint32_t)(b >> 32);
    printf("state: 0x%08X 0x%08X 0x%08X 0x%08X\n", s[0], s[1], s[2], s[3]);
    uint32_t u[8];
    for (int i = 0; i < 8; i++) u[i] = next();
    printf("u32:");
    for (int i = 0; i < 8; i++) printf(" 0x%08X", u[i]);
    printf("\nf32:");
    /* reset and draw as f32 (each f32 consumes one u32) */
    sm_state = 0; a = splitmix64(); b = splitmix64();
    s[0] = (uint32_t)a; s[1] = (uint32_t)(a >> 32);
    s[2] = (uint32_t)b; s[3] = (uint32_t)(b >> 32);
    for (int i = 0; i < 8; i++) {
        float f = (float)((double)(next() >> 8) * (1.0 / 16777216.0));
        printf(" %.9g", f);
    }
    printf("\n");
    return 0;
}
