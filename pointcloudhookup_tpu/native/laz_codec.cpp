// Native LAZ (LASzip) point codec: chunked arithmetic coding of LAS
// point records, formats 0-3 (POINT10 + GPSTIME11 + RGB12, item v2).
//
// The reference ingests LAS/LAZ through laspy(+lazrs)
// (/root/reference/pyGUI_towers_test.py:144-197); this file implements
// the LASzip algorithm from the published format description so the
// framework can read and write .laz without Python-level dependencies:
//   * FastAC-style adaptive arithmetic coder (32-bit range coder with
//     carry propagation, DM/BM length shifts 15/13),
//   * IntegerCompressor (k-bit corrector coding with per-context
//     adaptive models),
//   * POINT10 v2 (streamed-median XY prediction with 16 return-map
//     contexts, k-coupled y/z contexts), GPSTIME11 v2 (multi-sequence
//     delta multiplier coding), RGB12 v2 (byte-delta coding),
//   * chunked container with the compressed chunk-size table.
//
// Exposed via ctypes (pointcloudhookup_tpu/native/__init__.py); Python
// glue in pointcloudhookup_tpu/io/laz.py handles headers and the
// LASzip VLR.  Encode/decode are exact inverses (tested round-trip in
// tests/test_laz.py); interop with external laz files follows the spec
// to the best of this implementation (no external fixture available in
// this environment).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

typedef uint8_t U8;
typedef uint16_t U16;
typedef uint32_t U32;
typedef uint64_t U64;
typedef int8_t I8;
typedef int16_t I16;
typedef int32_t I32;
typedef int64_t I64;

constexpr U32 AC_MaxLength = 0xFFFFFFFFu;
constexpr U32 AC_MinLength = 0x01000000u;
constexpr int DM_LengthShift = 15;
constexpr U32 DM_MaxCount = 1u << DM_LengthShift;
constexpr int BM_LengthShift = 13;
constexpr U32 BM_MaxCount = 1u << BM_LengthShift;

// ---------------------------------------------------------------- models

struct SymbolModel {
    U32 symbols = 0;
    bool compress = false;
    std::vector<U32> distribution, symbol_count, decoder_table;
    U32 total_count = 0, update_cycle = 0, symbols_until_update = 0;
    U32 table_size = 0, table_shift = 0;
    U32 last_symbol = 0;

    void setup(U32 n, bool is_compressor) {
        symbols = n;
        compress = is_compressor;
        last_symbol = n - 1;
        if (!compress && n > 16) {
            U32 table_bits = 3;
            while (n > (1u << (table_bits + 2))) ++table_bits;
            table_size = 1u << table_bits;
            table_shift = DM_LengthShift - table_bits;
            decoder_table.assign(table_size + 2, 0);
        } else {
            table_size = table_shift = 0;
            decoder_table.clear();
        }
        distribution.assign(n, 0);
        symbol_count.assign(n, 0);
        init();
    }

    void init() {
        total_count = 0;
        update_cycle = symbols;
        for (U32 k = 0; k < symbols; k++) symbol_count[k] = 1;
        update();
        symbols_until_update = update_cycle = (symbols + 6) >> 1;
    }

    void update() {
        if ((total_count += update_cycle) > DM_MaxCount) {
            total_count = 0;
            for (U32 k = 0; k < symbols; k++)
                total_count += (symbol_count[k] = (symbol_count[k] + 1) >> 1);
        }
        U32 sum = 0, s = 0;
        U32 scale = 0x80000000u / total_count;
        if (compress || (table_size == 0)) {
            for (U32 k = 0; k < symbols; k++) {
                distribution[k] = (scale * sum) >> (31 - DM_LengthShift);
                sum += symbol_count[k];
            }
        } else {
            for (U32 k = 0; k < symbols; k++) {
                distribution[k] = (scale * sum) >> (31 - DM_LengthShift);
                sum += symbol_count[k];
                U32 w = distribution[k] >> table_shift;
                while (s < w) decoder_table[++s] = k - 1;
            }
            decoder_table[0] = 0;
            while (s <= table_size) decoder_table[++s] = symbols - 1;
        }
        update_cycle = (5 * update_cycle) >> 2;
        U32 max_cycle = (symbols + 6) << 3;
        if (update_cycle > max_cycle) update_cycle = max_cycle;
        symbols_until_update = update_cycle;
    }
};

struct BitModel {
    U32 bit_0_count = 0, bit_count = 0, bit_0_prob = 0;
    U32 update_cycle = 0, bits_until_update = 0;

    void init() {
        bit_0_count = 1;
        bit_count = 2;
        bit_0_prob = 1u << (BM_LengthShift - 1);
        update_cycle = bits_until_update = 4;
    }

    void update() {
        if ((bit_count += update_cycle) > BM_MaxCount) {
            bit_count = (bit_count + 1) >> 1;
            bit_0_count = (bit_0_count + 1) >> 1;
            if (bit_0_count == bit_count) ++bit_count;
        }
        U32 scale = 0x80000000u / bit_count;
        bit_0_prob = (bit_0_count * scale) >> (31 - BM_LengthShift);
        update_cycle = (5 * update_cycle) >> 2;
        if (update_cycle > 64) update_cycle = 64;
        bits_until_update = update_cycle;
    }
};

// ---------------------------------------------------------------- coder

struct Decoder {
    const U8* buf = nullptr;
    size_t pos = 0, size = 0;
    U32 value = 0, length = 0;

    U32 getByte() { return pos < size ? buf[pos++] : 0; }

    void init(const U8* b, size_t n) {
        buf = b;
        size = n;
        pos = 0;
        value = (getByte() << 24) | (getByte() << 16) | (getByte() << 8) |
                getByte();
        length = AC_MaxLength;
    }

    void renorm() {
        do {
            value = (value << 8) | getByte();
        } while ((length <<= 8) < AC_MinLength);
    }

    U32 decodeBit(BitModel& m) {
        U32 x = m.bit_0_prob * (length >> BM_LengthShift);
        U32 sym = (value >= x);
        if (sym == 0) {
            length = x;
            ++m.bit_0_count;
        } else {
            value -= x;
            length -= x;
        }
        if (length < AC_MinLength) renorm();
        if (--m.bits_until_update == 0) m.update();
        return sym;
    }

    U32 decodeSymbol(SymbolModel& m) {
        U32 n, sym, x, y = length;
        if (m.table_size) {
            U32 dv = value / (length >>= DM_LengthShift);
            U32 t = dv >> m.table_shift;
            sym = m.decoder_table[t];
            n = m.decoder_table[t + 1] + 1;
            while (n > sym + 1) {
                U32 k = (sym + n) >> 1;
                if (m.distribution[k] > dv) n = k; else sym = k;
            }
            x = m.distribution[sym] * length;
            if (sym != m.last_symbol) y = m.distribution[sym + 1] * length;
        } else {
            x = sym = 0;
            length >>= DM_LengthShift;
            U32 k = (n = m.symbols) >> 1;
            do {
                U32 z = length * m.distribution[k];
                if (z > value) {
                    n = k;
                    y = z;
                } else {
                    sym = k;
                    x = z;
                }
            } while ((k = (sym + n) >> 1) != sym);
        }
        value -= x;
        length = y - x;
        if (length < AC_MinLength) renorm();
        ++m.symbol_count[sym];
        if (--m.symbols_until_update == 0) m.update();
        return sym;
    }

    U32 readShort() {
        U32 sym = value / (length >>= 16);
        value -= length * sym;
        if (length < AC_MinLength) renorm();
        return sym;
    }

    U32 readBits(U32 bits) {
        if (bits > 19) {
            U32 lo = readShort();
            U32 hi = readBits(bits - 16);
            return (hi << 16) | lo;
        }
        U32 sym = value / (length >>= bits);
        value -= length * sym;
        if (length < AC_MinLength) renorm();
        return sym;
    }

    U32 readInt() {
        U32 lo = readShort();
        U32 hi = readShort();
        return (hi << 16) | lo;
    }
};

struct Encoder {
    std::vector<U8>* out = nullptr;
    size_t start = 0;
    U32 base = 0, length = 0;

    void init(std::vector<U8>* o) {
        out = o;
        start = o->size();
        base = 0;
        length = AC_MaxLength;
    }

    void propagate_carry() {
        size_t p = out->size();
        while (p > start && (*out)[p - 1] == 0xFF) {
            (*out)[p - 1] = 0;
            --p;
        }
        if (p > start) ++(*out)[p - 1];
    }

    void renorm() {
        do {
            out->push_back((U8)(base >> 24));
            base <<= 8;
        } while ((length <<= 8) < AC_MinLength);
    }

    void encodeBit(BitModel& m, U32 sym) {
        U32 x = m.bit_0_prob * (length >> BM_LengthShift);
        if (sym == 0) {
            length = x;
            ++m.bit_0_count;
        } else {
            U32 init_base = base;
            base += x;
            length -= x;
            if (init_base > base) propagate_carry();
        }
        if (length < AC_MinLength) renorm();
        if (--m.bits_until_update == 0) m.update();
    }

    void encodeSymbol(SymbolModel& m, U32 sym) {
        U32 x, init_base = base;
        if (sym == m.last_symbol) {
            x = m.distribution[sym] * (length >> DM_LengthShift);
            base += x;
            length -= x;
        } else {
            x = m.distribution[sym] * (length >>= DM_LengthShift);
            base += x;
            length = m.distribution[sym + 1] * length - x;
        }
        if (init_base > base) propagate_carry();
        if (length < AC_MinLength) renorm();
        ++m.symbol_count[sym];
        if (--m.symbols_until_update == 0) m.update();
    }

    void writeShort(U32 sym) {
        U32 init_base = base;
        base += sym * (length >>= 16);
        if (init_base > base) propagate_carry();
        if (length < AC_MinLength) renorm();
    }

    void writeBits(U32 bits, U32 sym) {
        if (bits > 19) {
            writeShort(sym & 0xFFFF);
            writeBits(bits - 16, sym >> 16);
            return;
        }
        U32 init_base = base;
        base += sym * (length >>= bits);
        if (init_base > base) propagate_carry();
        if (length < AC_MinLength) renorm();
    }

    void writeInt(U32 sym) {
        writeShort(sym & 0xFFFF);
        writeShort(sym >> 16);
    }

    void done() {
        U32 init_base = base;
        if (length > 2 * AC_MinLength) {
            base += AC_MinLength;
            length = AC_MinLength >> 1;
        } else {
            base += AC_MinLength >> 1;
            length = AC_MinLength >> 9;
        }
        if (init_base > base) propagate_carry();
        renorm();
        // pad so a decoder that primes 4 bytes always sees the full base
        out->push_back(0);
        out->push_back(0);
        out->push_back(0);
    }
};

// ----------------------------------------------------- IntegerCompressor

struct IntegerCompressor {
    U32 bits = 32, contexts = 1, bits_high = 8;
    U32 corr_bits = 0, corr_range = 0;
    I32 corr_min = 0;
    U32 k = 0;
    std::vector<SymbolModel> mBits;        // [contexts], corr_bits+1 syms
    BitModel mCorrector0;
    std::vector<SymbolModel> mCorrector;   // [1..corr_bits]

    void setup(U32 bits_, U32 contexts_, bool compressing) {
        bits = bits_;
        contexts = contexts_;
        if (bits && bits < 32) {
            corr_bits = bits;
            corr_range = 1u << bits;
            corr_min = -((I32)(corr_range / 2));
        } else {
            corr_bits = 32;
            corr_range = 0;
            corr_min = INT32_MIN;
        }
        mBits.resize(contexts);
        for (U32 c = 0; c < contexts; c++) mBits[c].setup(corr_bits + 1, compressing);
        mCorrector0.init();
        mCorrector.resize(corr_bits + 1);
        for (U32 i = 1; i <= corr_bits; i++)
            mCorrector[i].setup(i <= bits_high ? (1u << i) : (1u << bits_high),
                                compressing);
    }

    void init() {
        for (auto& m : mBits) m.init();
        mCorrector0.init();
        for (U32 i = 1; i <= corr_bits; i++) mCorrector[i].init();
    }

    U32 getK() const { return k; }

    I32 readCorrector(Decoder& dec, SymbolModel& model) {
        I32 c;
        k = dec.decodeSymbol(model);
        if (k) {
            if (k < 32) {
                if (k <= bits_high) {
                    c = (I32)dec.decodeSymbol(mCorrector[k]);
                } else {
                    U32 k1 = k - bits_high;
                    c = (I32)dec.decodeSymbol(mCorrector[k]);
                    U32 c1 = dec.readBits(k1);
                    c = (I32)(((U32)c << k1) | c1);
                }
                if ((U32)c >= (1u << (k - 1)))
                    c += 1;
                else
                    c -= (I32)((1u << k) - 1);
            } else {
                c = corr_min;
            }
        } else {
            c = (I32)dec.decodeBit(mCorrector0);
        }
        return c;
    }

    I32 decompress(Decoder& dec, I32 pred, U32 context) {
        I32 real = pred + readCorrector(dec, mBits[context]);
        if (corr_range) {
            if (real < 0)
                real += (I32)corr_range;
            else if ((U32)real >= corr_range)
                real -= (I32)corr_range;
        }
        return real;
    }

    void writeCorrector(Encoder& enc, I32 c, SymbolModel& model) {
        U32 c1 = (c <= 0) ? (U32)(-(I64)c) : (U32)(c - 1);
        k = 0;
        while (c1) {
            c1 >>= 1;
            ++k;
        }
        enc.encodeSymbol(model, k);
        if (k) {
            if (k < 32) {
                U32 cu;
                if (c >= 0)
                    cu = (U32)(c - 1);
                else
                    cu = (U32)(c + (I32)((1u << k) - 1));
                if (k <= bits_high) {
                    enc.encodeSymbol(mCorrector[k], cu);
                } else {
                    U32 k1 = k - bits_high;
                    enc.encodeSymbol(mCorrector[k], cu >> k1);
                    enc.writeBits(k1, cu & ((1u << k1) - 1));
                }
            }
        } else {
            enc.encodeBit(mCorrector0, (U32)c);
        }
    }

    void compress(Encoder& enc, I32 pred, I32 real, U32 context) {
        I32 corr = real - pred;
        if (corr_range) {
            if (corr < corr_min)
                corr += (I32)corr_range;
            else if (corr > corr_min + (I32)(corr_range - 1))
                corr -= (I32)corr_range;
        }
        writeCorrector(enc, corr, mBits[context]);
    }
};

// -------------------------------------------------------- streamed median

struct StreamingMedian5 {
    I32 values[5];
    bool high;

    void init() {
        values[0] = values[1] = values[2] = values[3] = values[4] = 0;
        high = true;
    }

    void add(I32 v) {
        if (high) {
            if (v < values[2]) {
                values[4] = values[3];
                values[3] = values[2];
                if (v < values[0]) {
                    values[2] = values[1];
                    values[1] = values[0];
                    values[0] = v;
                } else if (v < values[1]) {
                    values[2] = values[1];
                    values[1] = v;
                } else {
                    values[2] = v;
                }
            } else {
                if (v < values[3]) {
                    values[4] = values[3];
                    values[3] = v;
                } else {
                    values[4] = v;
                }
                high = false;
            }
        } else {
            if (values[2] < v) {
                values[0] = values[1];
                values[1] = values[2];
                if (values[4] < v) {
                    values[2] = values[3];
                    values[3] = values[4];
                    values[4] = v;
                } else if (values[3] < v) {
                    values[2] = values[3];
                    values[3] = v;
                } else {
                    values[2] = v;
                }
            } else {
                if (values[1] < v) {
                    values[0] = values[1];
                    values[1] = v;
                } else {
                    values[0] = v;
                }
                high = true;
            }
        }
    }

    I32 get() const { return values[2]; }
};

// -------------------------------------------------------------- POINT10

// little-endian field access on a 20-byte POINT10 record
inline I32 rd_i32(const U8* p) { I32 v; memcpy(&v, p, 4); return v; }
inline U16 rd_u16(const U8* p) { U16 v; memcpy(&v, p, 2); return v; }
inline void wr_i32(U8* p, I32 v) { memcpy(p, &v, 4); }
inline void wr_u16(U8* p, U16 v) { memcpy(p, &v, 2); }

inline U8 u8_fold(I32 v) { return (U8)(v & 0xFF); }
inline U8 u8_clamp(I32 v) { return v < 0 ? 0 : (v > 255 ? 255 : (U8)v); }

const U8 number_return_map[8][8] = {
    {15, 14, 13, 12, 11, 10, 9, 8},  {14, 0, 1, 3, 6, 10, 10, 9},
    {13, 1, 2, 4, 7, 11, 11, 10},    {12, 3, 4, 5, 8, 12, 12, 11},
    {11, 6, 7, 8, 9, 13, 13, 12},    {10, 10, 11, 12, 13, 14, 14, 13},
    {9, 10, 11, 12, 13, 14, 15, 14}, {8, 9, 10, 11, 12, 13, 14, 15}};

const U8 number_return_level[8][8] = {
    {0, 1, 2, 3, 4, 5, 6, 7}, {1, 0, 1, 2, 3, 4, 5, 6},
    {2, 1, 0, 1, 2, 3, 4, 5}, {3, 2, 1, 0, 1, 2, 3, 4},
    {4, 3, 2, 1, 0, 1, 2, 3}, {5, 4, 3, 2, 1, 0, 1, 2},
    {6, 5, 4, 3, 2, 1, 0, 1}, {7, 6, 5, 4, 3, 2, 1, 0}};

struct Point10 {
    I32 x, y, z;
    U16 intensity;
    U8 bit_byte;  // return num (3) | num returns (3) | scan dir (1) | edge (1)
    U8 classification;
    I8 scan_angle_rank;
    U8 user_data;
    U16 point_source_ID;

    void from_bytes(const U8* p) {
        x = rd_i32(p);
        y = rd_i32(p + 4);
        z = rd_i32(p + 8);
        intensity = rd_u16(p + 12);
        bit_byte = p[14];
        classification = p[15];
        scan_angle_rank = (I8)p[16];
        user_data = p[17];
        point_source_ID = rd_u16(p + 18);
    }

    void to_bytes(U8* p) const {
        wr_i32(p, x);
        wr_i32(p + 4, y);
        wr_i32(p + 8, z);
        wr_u16(p + 12, intensity);
        p[14] = bit_byte;
        p[15] = classification;
        p[16] = (U8)scan_angle_rank;
        p[17] = user_data;
        wr_u16(p + 18, point_source_ID);
    }

    U32 return_number() const { return bit_byte & 7; }
    U32 number_of_returns() const { return (bit_byte >> 3) & 7; }
    U32 scan_direction_flag() const { return (bit_byte >> 6) & 1; }
};

struct Point10Codec {
    bool compressing;
    Point10 last;
    U16 last_intensity[16];
    StreamingMedian5 last_x_diff_median5[16], last_y_diff_median5[16];
    I32 last_height[8];

    SymbolModel m_changed_values;
    IntegerCompressor ic_intensity;
    SymbolModel m_scan_angle_rank[2];
    IntegerCompressor ic_point_source_ID;
    std::vector<SymbolModel> m_bit_byte, m_classification, m_user_data;
    std::vector<bool> has_bit_byte, has_classification, has_user_data;
    IntegerCompressor ic_dx, ic_dy, ic_z;

    void setup(bool compr) {
        compressing = compr;
        m_changed_values.setup(64, compr);
        ic_intensity.setup(16, 4, compr);
        m_scan_angle_rank[0].setup(256, compr);
        m_scan_angle_rank[1].setup(256, compr);
        ic_point_source_ID.setup(16, 1, compr);
        m_bit_byte.resize(256);
        m_classification.resize(256);
        m_user_data.resize(256);
        has_bit_byte.assign(256, false);
        has_classification.assign(256, false);
        has_user_data.assign(256, false);
        ic_dx.setup(32, 2, compr);
        ic_dy.setup(32, 22, compr);
        ic_z.setup(32, 20, compr);
    }

    SymbolModel& lazy(std::vector<SymbolModel>& v, std::vector<bool>& h, U8 i) {
        if (!h[i]) {
            v[i].setup(256, compressing);
            h[i] = true;
        } else {
            // created in a previous chunk: re-init at chunk start is done
            // via init() resetting the flag arrays below
        }
        return v[i];
    }

    void init(const U8* first_point) {
        for (int i = 0; i < 16; i++) {
            last_x_diff_median5[i].init();
            last_y_diff_median5[i].init();
            last_intensity[i] = 0;
        }
        for (int i = 0; i < 8; i++) last_height[i] = 0;
        m_changed_values.init();
        ic_intensity.init();
        m_scan_angle_rank[0].init();
        m_scan_angle_rank[1].init();
        ic_point_source_ID.init();
        has_bit_byte.assign(256, false);
        has_classification.assign(256, false);
        has_user_data.assign(256, false);
        ic_dx.init();
        ic_dy.init();
        ic_z.init();
        last.from_bytes(first_point);
    }

    void read(Decoder& dec, U8* out20) {
        U32 changed_values = dec.decodeSymbol(m_changed_values);
        if (changed_values & 32)
            last.bit_byte =
                (U8)dec.decodeSymbol(lazy(m_bit_byte, has_bit_byte, last.bit_byte));
        U32 r = last.return_number(), n = last.number_of_returns();
        U32 m = number_return_map[n][r];
        U32 l = number_return_level[n][r];
        if (changed_values & 16) {
            last.intensity = (U16)ic_intensity.decompress(
                dec, last_intensity[m], m < 3 ? m : 3);
            last_intensity[m] = last.intensity;
        } else {
            last.intensity = last_intensity[m];
        }
        if (changed_values & 8)
            last.classification = (U8)dec.decodeSymbol(
                lazy(m_classification, has_classification, last.classification));
        if (changed_values & 4) {
            U32 val = dec.decodeSymbol(m_scan_angle_rank[last.scan_direction_flag()]);
            last.scan_angle_rank = (I8)u8_fold((I32)val + (I32)(U8)last.scan_angle_rank);
        }
        if (changed_values & 2)
            last.user_data = (U8)dec.decodeSymbol(
                lazy(m_user_data, has_user_data, last.user_data));
        if (changed_values & 1)
            last.point_source_ID =
                (U16)ic_point_source_ID.decompress(dec, last.point_source_ID, 0);

        // x
        I32 median = last_x_diff_median5[m].get();
        I32 diff = ic_dx.decompress(dec, median, n == 1);
        last.x += diff;
        last_x_diff_median5[m].add(diff);
        // y (context coupled to dx's k)
        median = last_y_diff_median5[m].get();
        U32 k_bits = ic_dx.getK();
        diff = ic_dy.decompress(
            dec, median, (n == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20));
        last.y += diff;
        last_y_diff_median5[m].add(diff);
        // z (context coupled to mean k of dx/dy, predicted by last height
        // at this return level)
        k_bits = (ic_dx.getK() + ic_dy.getK()) / 2;
        last.z = ic_z.decompress(
            dec, last_height[l], (n == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18));
        last_height[l] = last.z;
        last.to_bytes(out20);
    }

    void write(Encoder& enc, const U8* in20) {
        Point10 item;
        item.from_bytes(in20);
        U32 r = item.return_number(), n = item.number_of_returns();
        U32 m = number_return_map[n][r];
        U32 l = number_return_level[n][r];
        U32 changed_values =
            ((last.bit_byte != item.bit_byte) << 5) |
            ((last_intensity[m] != item.intensity) << 4) |
            ((last.classification != item.classification) << 3) |
            ((last.scan_angle_rank != item.scan_angle_rank) << 2) |
            ((last.user_data != item.user_data) << 1) |
            (last.point_source_ID != item.point_source_ID);
        enc.encodeSymbol(m_changed_values, changed_values);
        if (changed_values & 32) {
            enc.encodeSymbol(lazy(m_bit_byte, has_bit_byte, last.bit_byte),
                             item.bit_byte);
        }
        if (changed_values & 16) {
            ic_intensity.compress(enc, last_intensity[m], item.intensity,
                                  m < 3 ? m : 3);
            last_intensity[m] = item.intensity;
        }
        if (changed_values & 8)
            enc.encodeSymbol(
                lazy(m_classification, has_classification, last.classification),
                item.classification);
        if (changed_values & 4)
            enc.encodeSymbol(
                m_scan_angle_rank[item.scan_direction_flag()],
                u8_fold((I32)(U8)item.scan_angle_rank - (I32)(U8)last.scan_angle_rank));
        if (changed_values & 2)
            enc.encodeSymbol(lazy(m_user_data, has_user_data, last.user_data),
                             item.user_data);
        if (changed_values & 1)
            ic_point_source_ID.compress(enc, last.point_source_ID,
                                        item.point_source_ID, 0);
        // x
        I32 median = last_x_diff_median5[m].get();
        I32 diff = item.x - last.x;
        ic_dx.compress(enc, median, diff, n == 1);
        last_x_diff_median5[m].add(diff);
        // y
        median = last_y_diff_median5[m].get();
        U32 k_bits = ic_dx.getK();
        diff = item.y - last.y;
        ic_dy.compress(enc, median, diff,
                       (n == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20));
        last_y_diff_median5[m].add(diff);
        // z
        k_bits = (ic_dx.getK() + ic_dy.getK()) / 2;
        ic_z.compress(enc, last_height[l], item.z,
                      (n == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18));
        last_height[l] = item.z;
        last = item;
    }
};

// ------------------------------------------------------------- GPSTIME11

constexpr I32 GPSTIME_MULTI = 500;
constexpr I32 GPSTIME_MULTI_MINUS = -10;
constexpr U32 GPSTIME_MULTI_UNCHANGED = (U32)(GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 1);
constexpr U32 GPSTIME_MULTI_CODE_FULL = (U32)(GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 2);
constexpr U32 GPSTIME_MULTI_TOTAL = (U32)(GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 6);

inline I32 i32_quantize(double f) {
    return (f >= 0) ? (I32)(f + 0.5) : (I32)(f - 0.5);
}

struct GpsTime11Codec {
    bool compressing;
    U32 last, next;
    U64 last_gpstime[4];
    I32 last_gpstime_diff[4];
    I32 multi_extreme_counter[4];
    SymbolModel m_gpstime_multi, m_gpstime_0diff;
    IntegerCompressor ic_gpstime;

    void setup(bool compr) {
        compressing = compr;
        m_gpstime_multi.setup(GPSTIME_MULTI_TOTAL, compr);
        m_gpstime_0diff.setup(6, compr);
        ic_gpstime.setup(32, 9, compr);
    }

    void init(const U8* first8) {
        m_gpstime_multi.init();
        m_gpstime_0diff.init();
        ic_gpstime.init();
        last = next = 0;
        for (int i = 0; i < 4; i++) {
            last_gpstime[i] = 0;
            last_gpstime_diff[i] = 0;
            multi_extreme_counter[i] = 0;
        }
        memcpy(&last_gpstime[0], first8, 8);
    }

    void read(Decoder& dec, U8* out8) {
        if (last_gpstime_diff[last] == 0) {
            U32 multi = dec.decodeSymbol(m_gpstime_0diff);
            if (multi == 1) {  // difference fits in 32 bits
                last_gpstime_diff[last] = ic_gpstime.decompress(dec, 0, 0);
                last_gpstime[last] =
                    (U64)((I64)last_gpstime[last] + last_gpstime_diff[last]);
                multi_extreme_counter[last] = 0;
            } else if (multi == 2) {  // full 64-bit value
                next = (next + 1) & 3;
                U64 hi = (U64)(U32)ic_gpstime.decompress(
                    dec, (I32)(last_gpstime[last] >> 32), 8);
                last_gpstime[next] = (hi << 32) | (U64)dec.readInt();
                last = next;
                last_gpstime_diff[last] = 0;
                multi_extreme_counter[last] = 0;
            } else if (multi > 2) {  // switch to another sequence
                last = (last + multi - 2) & 3;
                read(dec, out8);
                return;
            }
            // multi == 0: unchanged
        } else {
            U32 multi = dec.decodeSymbol(m_gpstime_multi);
            if (multi == 1) {
                last_gpstime[last] = (U64)((I64)last_gpstime[last] +
                    ic_gpstime.decompress(dec, last_gpstime_diff[last], 1));
                multi_extreme_counter[last] = 0;
            } else if (multi < GPSTIME_MULTI_UNCHANGED) {
                I32 gpstime_diff;
                if (multi == 0) {
                    gpstime_diff = ic_gpstime.decompress(dec, 0, 7);
                    multi_extreme_counter[last]++;
                    if (multi_extreme_counter[last] > 3) {
                        last_gpstime_diff[last] = gpstime_diff;
                        multi_extreme_counter[last] = 0;
                    }
                } else if (multi < (U32)GPSTIME_MULTI) {
                    if (multi < 10)
                        gpstime_diff = ic_gpstime.decompress(
                            dec, (I32)multi * last_gpstime_diff[last], 2);
                    else
                        gpstime_diff = ic_gpstime.decompress(
                            dec, (I32)multi * last_gpstime_diff[last], 3);
                } else if (multi == (U32)GPSTIME_MULTI) {
                    gpstime_diff = ic_gpstime.decompress(
                        dec, GPSTIME_MULTI * last_gpstime_diff[last], 4);
                    multi_extreme_counter[last]++;
                    if (multi_extreme_counter[last] > 3) {
                        last_gpstime_diff[last] = gpstime_diff;
                        multi_extreme_counter[last] = 0;
                    }
                } else {
                    I32 multi_neg = GPSTIME_MULTI - (I32)multi;  // -1..-10
                    if (multi_neg > GPSTIME_MULTI_MINUS) {
                        gpstime_diff = ic_gpstime.decompress(
                            dec, multi_neg * last_gpstime_diff[last], 5);
                    } else {
                        gpstime_diff = ic_gpstime.decompress(
                            dec, GPSTIME_MULTI_MINUS * last_gpstime_diff[last], 6);
                        multi_extreme_counter[last]++;
                        if (multi_extreme_counter[last] > 3) {
                            last_gpstime_diff[last] = gpstime_diff;
                            multi_extreme_counter[last] = 0;
                        }
                    }
                }
                last_gpstime[last] = (U64)((I64)last_gpstime[last] + gpstime_diff);
            } else if (multi == GPSTIME_MULTI_UNCHANGED) {
                // unchanged
            } else if (multi == GPSTIME_MULTI_CODE_FULL) {
                next = (next + 1) & 3;
                U64 hi = (U64)(U32)ic_gpstime.decompress(
                    dec, (I32)(last_gpstime[last] >> 32), 8);
                last_gpstime[next] = (hi << 32) | (U64)dec.readInt();
                last = next;
                last_gpstime_diff[last] = 0;
                multi_extreme_counter[last] = 0;
            } else {  // switch sequence
                last = (last + multi - GPSTIME_MULTI_CODE_FULL) & 3;
                read(dec, out8);
                return;
            }
        }
        memcpy(out8, &last_gpstime[last], 8);
    }

    void write(Encoder& enc, const U8* in8) {
        U64 this_time;
        memcpy(&this_time, in8, 8);
        if (last_gpstime_diff[last] == 0) {
            if (this_time == last_gpstime[last]) {
                enc.encodeSymbol(m_gpstime_0diff, 0);
            } else {
                I64 diff64 = (I64)this_time - (I64)last_gpstime[last];
                I32 diff = (I32)diff64;
                if ((I64)diff == diff64) {
                    enc.encodeSymbol(m_gpstime_0diff, 1);
                    ic_gpstime.compress(enc, 0, diff, 0);
                    last_gpstime_diff[last] = diff;
                    multi_extreme_counter[last] = 0;
                    last_gpstime[last] = this_time;
                } else {
                    // try the other three sequences
                    for (U32 i = 1; i < 4; i++) {
                        I64 od = (I64)this_time - (I64)last_gpstime[(last + i) & 3];
                        if ((I64)(I32)od == od) {
                            enc.encodeSymbol(m_gpstime_0diff, i + 2);
                            last = (last + i) & 3;
                            write(enc, in8);
                            return;
                        }
                    }
                    enc.encodeSymbol(m_gpstime_0diff, 2);  // full
                    ic_gpstime.compress(enc, (I32)(last_gpstime[last] >> 32),
                                        (I32)(this_time >> 32), 8);
                    enc.writeInt((U32)this_time);
                    next = (next + 1) & 3;
                    last = next;
                    last_gpstime[last] = this_time;
                    last_gpstime_diff[last] = 0;
                    multi_extreme_counter[last] = 0;
                }
            }
        } else {
            if (this_time == last_gpstime[last]) {
                enc.encodeSymbol(m_gpstime_multi, GPSTIME_MULTI_UNCHANGED);
            } else {
                I64 diff64 = (I64)this_time - (I64)last_gpstime[last];
                I32 diff = (I32)diff64;
                if ((I64)diff == diff64) {
                    double multi_f =
                        (double)diff / (double)last_gpstime_diff[last];
                    I32 multi = i32_quantize(multi_f);
                    if (multi == 1) {
                        enc.encodeSymbol(m_gpstime_multi, 1);
                        ic_gpstime.compress(enc, last_gpstime_diff[last], diff, 1);
                        multi_extreme_counter[last] = 0;
                    } else if (multi == 0) {
                        enc.encodeSymbol(m_gpstime_multi, 0);
                        ic_gpstime.compress(enc, 0, diff, 7);
                        multi_extreme_counter[last]++;
                        if (multi_extreme_counter[last] > 3) {
                            last_gpstime_diff[last] = diff;
                            multi_extreme_counter[last] = 0;
                        }
                    } else if (multi > 1 && multi < GPSTIME_MULTI) {
                        enc.encodeSymbol(m_gpstime_multi, (U32)multi);
                        if (multi < 10)
                            ic_gpstime.compress(
                                enc, multi * last_gpstime_diff[last], diff, 2);
                        else
                            ic_gpstime.compress(
                                enc, multi * last_gpstime_diff[last], diff, 3);
                    } else if (multi >= GPSTIME_MULTI) {
                        enc.encodeSymbol(m_gpstime_multi, (U32)GPSTIME_MULTI);
                        ic_gpstime.compress(
                            enc, GPSTIME_MULTI * last_gpstime_diff[last], diff, 4);
                        multi_extreme_counter[last]++;
                        if (multi_extreme_counter[last] > 3) {
                            last_gpstime_diff[last] = diff;
                            multi_extreme_counter[last] = 0;
                        }
                    } else if (multi < 0 && multi > GPSTIME_MULTI_MINUS) {
                        enc.encodeSymbol(m_gpstime_multi,
                                         (U32)(GPSTIME_MULTI - multi));
                        ic_gpstime.compress(
                            enc, multi * last_gpstime_diff[last], diff, 5);
                    } else if (multi <= GPSTIME_MULTI_MINUS) {
                        enc.encodeSymbol(
                            m_gpstime_multi,
                            (U32)(GPSTIME_MULTI - GPSTIME_MULTI_MINUS));
                        ic_gpstime.compress(
                            enc, GPSTIME_MULTI_MINUS * last_gpstime_diff[last],
                            diff, 6);
                        multi_extreme_counter[last]++;
                        if (multi_extreme_counter[last] > 3) {
                            last_gpstime_diff[last] = diff;
                            multi_extreme_counter[last] = 0;
                        }
                    } else {  // multi == -0? unreachable; treat as 0
                        enc.encodeSymbol(m_gpstime_multi, 0);
                        ic_gpstime.compress(enc, 0, diff, 7);
                    }
                    last_gpstime[last] = this_time;
                } else {
                    for (U32 i = 1; i < 4; i++) {
                        I64 od = (I64)this_time - (I64)last_gpstime[(last + i) & 3];
                        if ((I64)(I32)od == od) {
                            enc.encodeSymbol(m_gpstime_multi,
                                             GPSTIME_MULTI_CODE_FULL + i);
                            last = (last + i) & 3;
                            write(enc, in8);
                            return;
                        }
                    }
                    enc.encodeSymbol(m_gpstime_multi, GPSTIME_MULTI_CODE_FULL);
                    ic_gpstime.compress(enc, (I32)(last_gpstime[last] >> 32),
                                        (I32)(this_time >> 32), 8);
                    enc.writeInt((U32)this_time);
                    next = (next + 1) & 3;
                    last = next;
                    last_gpstime[last] = this_time;
                    last_gpstime_diff[last] = 0;
                    multi_extreme_counter[last] = 0;
                }
            }
        }
    }
};

// ---------------------------------------------------------------- RGB12

struct Rgb12Codec {
    bool compressing;
    U16 last_r, last_g, last_b;
    SymbolModel m_byte_used;
    SymbolModel m_rgb_diff[6];

    void setup(bool compr) {
        compressing = compr;
        m_byte_used.setup(128, compr);
        for (int i = 0; i < 6; i++) m_rgb_diff[i].setup(256, compr);
    }

    void init(const U8* first6) {
        m_byte_used.init();
        for (int i = 0; i < 6; i++) m_rgb_diff[i].init();
        last_r = rd_u16(first6);
        last_g = rd_u16(first6 + 2);
        last_b = rd_u16(first6 + 4);
    }

    void read(Decoder& dec, U8* out6) {
        U32 sym = dec.decodeSymbol(m_byte_used);
        I32 corr, diff = 0;
        U16 r, g, b;
        U8 r_lo, r_hi, g_lo, g_hi, b_lo, b_hi;
        if (sym & 1) {
            corr = (I32)dec.decodeSymbol(m_rgb_diff[0]);
            r_lo = u8_fold(corr + (last_r & 255));
        } else {
            r_lo = last_r & 255;
        }
        if (sym & 2) {
            corr = (I32)dec.decodeSymbol(m_rgb_diff[1]);
            r_hi = u8_fold(corr + (last_r >> 8));
        } else {
            r_hi = last_r >> 8;
        }
        r = (U16)(r_lo | (r_hi << 8));
        if (sym & 64) {
            diff = (I32)r_lo - (I32)(last_r & 255);
            if (sym & 4) {
                corr = (I32)dec.decodeSymbol(m_rgb_diff[2]);
                g_lo = u8_fold(corr + u8_clamp(diff + (last_g & 255)));
            } else {
                g_lo = last_g & 255;
            }
            if (sym & 16) {
                diff = (diff + (I32)g_lo - (I32)(last_g & 255)) / 2;
                corr = (I32)dec.decodeSymbol(m_rgb_diff[4]);
                b_lo = u8_fold(corr + u8_clamp(diff + (last_b & 255)));
            } else {
                b_lo = last_b & 255;
            }
            diff = (I32)r_hi - (I32)(last_r >> 8);
            if (sym & 8) {
                corr = (I32)dec.decodeSymbol(m_rgb_diff[3]);
                g_hi = u8_fold(corr + u8_clamp(diff + (last_g >> 8)));
            } else {
                g_hi = last_g >> 8;
            }
            if (sym & 32) {
                diff = (diff + (I32)g_hi - (I32)(last_g >> 8)) / 2;
                corr = (I32)dec.decodeSymbol(m_rgb_diff[5]);
                b_hi = u8_fold(corr + u8_clamp(diff + (last_b >> 8)));
            } else {
                b_hi = last_b >> 8;
            }
            g = (U16)(g_lo | (g_hi << 8));
            b = (U16)(b_lo | (b_hi << 8));
        } else {
            g = r;
            b = r;
        }
        last_r = r;
        last_g = g;
        last_b = b;
        wr_u16(out6, r);
        wr_u16(out6 + 2, g);
        wr_u16(out6 + 4, b);
    }

    void write(Encoder& enc, const U8* in6) {
        U16 r = rd_u16(in6), g = rd_u16(in6 + 2), b = rd_u16(in6 + 4);
        U32 sym = ((last_r & 255) != (r & 255)) << 0 |
                  ((last_r >> 8) != (r >> 8)) << 1 |
                  ((last_g & 255) != (g & 255)) << 2 |
                  ((last_g >> 8) != (g >> 8)) << 3 |
                  ((last_b & 255) != (b & 255)) << 4 |
                  ((last_b >> 8) != (b >> 8)) << 5;
        // bit 6: g/b carry information beyond r (not grayscale-with-r)
        bool gray = (r == g) && (r == b);
        sym |= (!gray) << 6;
        enc.encodeSymbol(m_byte_used, sym);
        I32 diff = 0;
        if (sym & 1)
            enc.encodeSymbol(m_rgb_diff[0],
                             u8_fold((I32)(r & 255) - (I32)(last_r & 255)));
        if (sym & 2)
            enc.encodeSymbol(m_rgb_diff[1],
                             u8_fold((I32)(r >> 8) - (I32)(last_r >> 8)));
        if (sym & 64) {
            diff = (I32)(r & 255) - (I32)(last_r & 255);
            if (sym & 4)
                enc.encodeSymbol(
                    m_rgb_diff[2],
                    u8_fold((I32)(g & 255) - u8_clamp(diff + (last_g & 255))));
            if (sym & 16) {
                diff = (diff + (I32)(g & 255) - (I32)(last_g & 255)) / 2;
                enc.encodeSymbol(
                    m_rgb_diff[4],
                    u8_fold((I32)(b & 255) - u8_clamp(diff + (last_b & 255))));
            }
            diff = (I32)(r >> 8) - (I32)(last_r >> 8);
            if (sym & 8)
                enc.encodeSymbol(
                    m_rgb_diff[3],
                    u8_fold((I32)(g >> 8) - u8_clamp(diff + (last_g >> 8))));
            if (sym & 32) {
                diff = (diff + (I32)(g >> 8) - (I32)(last_g >> 8)) / 2;
                enc.encodeSymbol(
                    m_rgb_diff[5],
                    u8_fold((I32)(b >> 8) - u8_clamp(diff + (last_b >> 8))));
            }
        }
        last_r = r;
        last_g = g;
        last_b = b;
    }
};

// ======================================================================
// LAS 1.4 native point formats 6-10: LASzip "layered" compression
// (compressor 3, item versions 3).  Each chunk stores its first point
// raw, then a u32 point count, then one u32 byte-count per layer, then
// the layers' arithmetic-coded bytes.  Fields live in SEPARATE layers
// (returns/XY, Z, classification, flags, intensity, scan angle, user
// data, point source, GPS time), each with its own coder, and all
// models are per-scanner-channel contexts (4).
//
// INTEROP NOTE: the container layout, layer structure, coder, and
// integer compressor follow the published LASzip format description
// and are expected byte-compatible.  The ONE detail reconstructed
// rather than transcribed is the pair of 16x16 context-quantization
// tables below (the published 8x8 POINT10 tables extended to 16
// returns and clamped to 6 map / 8 level contexts).  Any context
// table yields a self-consistent codec (round-trip exact); a single
// real laszip-produced format-6 sample would confirm or correct the
// entries.  Encode and decode share them, and they are isolated here
// on purpose.
// ======================================================================

static U8 nr_map_6ctx(U32 n, U32 r) {
    U32 v = number_return_map[n < 8 ? n : 7][r < 8 ? r : 7];
    return (U8)(v < 6 ? v : 5);
}
static U8 nr_level_8ctx(U32 n, U32 r) {
    U32 v = number_return_level[n < 8 ? n : 7][r < 8 ? r : 7];
    return (U8)(v < 8 ? v : 7);
}

// 30-byte POINT14 record (LAS 1.4 formats 6-10)
struct Point14 {
    I32 x, y, z;
    U16 intensity;
    U8 returns_byte;  // return number (0:3) | number of returns (4:7)
    U8 flags_byte;    // class flags (0:3) | channel (4:5) | scan dir (6) | edge (7)
    U8 classification;
    U8 user_data;
    I16 scan_angle;
    U16 point_source_ID;
    U64 gps_time_bits;

    void from_bytes(const U8* p) {
        x = rd_i32(p);
        y = rd_i32(p + 4);
        z = rd_i32(p + 8);
        intensity = rd_u16(p + 12);
        returns_byte = p[14];
        flags_byte = p[15];
        classification = p[16];
        user_data = p[17];
        scan_angle = (I16)rd_u16(p + 18);
        point_source_ID = rd_u16(p + 20);
        memcpy(&gps_time_bits, p + 22, 8);
    }
    void to_bytes(U8* p) const {
        wr_i32(p, x);
        wr_i32(p + 4, y);
        wr_i32(p + 8, z);
        wr_u16(p + 12, intensity);
        p[14] = returns_byte;
        p[15] = flags_byte;
        p[16] = classification;
        p[17] = user_data;
        wr_u16(p + 18, (U16)scan_angle);
        wr_u16(p + 20, point_source_ID);
        memcpy(p + 22, &gps_time_bits, 8);
    }
    U32 return_number() const { return returns_byte & 0x0F; }
    U32 number_of_returns() const { return returns_byte >> 4; }
    U32 classification_flags() const { return flags_byte & 0x0F; }
    U32 scanner_channel() const { return (flags_byte >> 4) & 3; }
    U32 scan_direction() const { return (flags_byte >> 6) & 1; }
    U32 edge_of_flight() const { return flags_byte >> 7; }
};

// one layer: its own byte stream + coder (decode side slices the chunk)
struct LayerDec {
    Decoder dec;
    bool present = false;
    void attach(const U8* p, U32 n) {
        present = n > 0;
        if (present) dec.init(p, n);
    }
};
struct LayerEnc {
    std::vector<U8> buf;
    Encoder enc;
    bool open = false;
    void reset() {
        buf.clear();
        enc.init(&buf);
        open = true;
    }
    U32 close() {  // returns byte size
        if (open) {
            enc.done();
            open = false;
        }
        return (U32)buf.size();
    }
};

struct Point14Ctx {
    bool unused = true;
    Point14 last;
    bool last_gps_time_change = false;
    U16 last_intensity[8];
    StreamingMedian5 last_X_diff_median5[12], last_Y_diff_median5[12];
    I32 last_Z[8];

    SymbolModel m_changed_values[8];
    SymbolModel m_scanner_channel;
    std::vector<SymbolModel> m_number_of_returns, m_return_number;
    std::vector<bool> has_nr, has_rn;
    SymbolModel m_return_number_gps_same;
    IntegerCompressor ic_dX, ic_dY, ic_Z;
    std::vector<SymbolModel> m_classification, m_flags, m_user_data;
    std::vector<bool> has_cls, has_flg, has_usr;
    IntegerCompressor ic_intensity, ic_scan_angle, ic_point_source;
    GpsTime11Codec gps;
    bool compressing = false;

    void create(bool compr, const Point14& seed, bool seed_gps_change) {
        compressing = compr;
        for (int i = 0; i < 8; i++) m_changed_values[i].setup(128, compr);
        m_scanner_channel.setup(3, compr);
        m_number_of_returns.assign(16, SymbolModel());
        m_return_number.assign(16, SymbolModel());
        has_nr.assign(16, false);
        has_rn.assign(16, false);
        m_return_number_gps_same.setup(13, compr);
        ic_dX.setup(32, 2, compr);
        ic_dY.setup(32, 22, compr);
        ic_Z.setup(32, 20, compr);
        m_classification.assign(64, SymbolModel());
        m_flags.assign(64, SymbolModel());
        m_user_data.assign(64, SymbolModel());
        has_cls.assign(64, false);
        has_flg.assign(64, false);
        has_usr.assign(64, false);
        ic_intensity.setup(16, 4, compr);
        ic_scan_angle.setup(16, 2, compr);
        ic_point_source.setup(16, 1, compr);
        gps.setup(compr);
        for (int i = 0; i < 8; i++) {
            last_intensity[i] = seed.intensity;
            last_Z[i] = seed.z;
        }
        for (int i = 0; i < 12; i++) {
            last_X_diff_median5[i].init();
            last_Y_diff_median5[i].init();
        }
        U8 g8[8];
        memcpy(g8, &seed.gps_time_bits, 8);
        gps.init(g8);
        last = seed;
        last_gps_time_change = seed_gps_change;
        unused = false;
    }

    SymbolModel& lazy(std::vector<SymbolModel>& v, std::vector<bool>& h,
                      U32 i, U32 syms) {
        if (!h[i]) {
            v[i].setup(syms, compressing);
            h[i] = true;
        }
        return v[i];
    }
};

// layer ids for POINT14 (order of the u32 size fields in the chunk)
enum {
    L14_CHANNEL_RETURNS_XY = 0,
    L14_Z,
    L14_CLASSIFICATION,
    L14_FLAGS,
    L14_INTENSITY,
    L14_SCAN_ANGLE,
    L14_USER_DATA,
    L14_POINT_SOURCE,
    L14_GPS_TIME,
    L14_COUNT
};

struct Point14v3Dec {
    Point14Ctx ctx[4];
    U32 current = 0;
    LayerDec layer[L14_COUNT];

    // first_point raw; layer pointers already attached by caller
    void init(const U8* first_point) {
        for (int i = 0; i < 4; i++) ctx[i].unused = true;
        Point14 p;
        p.from_bytes(first_point);
        current = p.scanner_channel();
        ctx[current].create(false, p, false);
    }

    void read(U8* out30) {
        Point14Ctx* c = &ctx[current];
        U32 lr = c->last.return_number(), ln = c->last.number_of_returns();
        U32 lpr = (lr == 1 ? 1 : 0) + (lr >= ln ? 2 : 0) +
                  (c->last_gps_time_change ? 4 : 0);
        U32 changed =
            layer[L14_CHANNEL_RETURNS_XY].dec.decodeSymbol(c->m_changed_values[lpr]);
        if (changed & (1u << 6)) {
            U32 diff =
                layer[L14_CHANNEL_RETURNS_XY].dec.decodeSymbol(c->m_scanner_channel);
            U32 sc = (current + diff + 1) & 3;
            if (ctx[sc].unused)
                ctx[sc].create(false, c->last, c->last_gps_time_change);
            current = sc;
            c = &ctx[current];
            lr = c->last.return_number();
            ln = c->last.number_of_returns();
        }
        bool point_source_change = changed & (1u << 5);
        bool gps_time_change = changed & (1u << 4);
        bool scan_angle_change = changed & (1u << 3);

        Point14 item = c->last;
        item.flags_byte = (U8)((item.flags_byte & ~0x30u) | (current << 4));

        U32 n;
        if (changed & (1u << 2))
            n = layer[L14_CHANNEL_RETURNS_XY].dec.decodeSymbol(
                c->lazy(c->m_number_of_returns, c->has_nr, ln, 16));
        else
            n = ln;
        U32 r;
        switch (changed & 3u) {
            case 0: r = lr; break;
            case 1: r = (lr + 1) & 15; break;
            case 2: r = (lr + 15) & 15; break;
            default:
                if (gps_time_change)
                    r = layer[L14_CHANNEL_RETURNS_XY].dec.decodeSymbol(
                        c->lazy(c->m_return_number, c->has_rn, lr, 16));
                else
                    r = (lr + layer[L14_CHANNEL_RETURNS_XY].dec.decodeSymbol(
                                  c->m_return_number_gps_same) +
                         2) & 15;
        }
        item.returns_byte = (U8)(r | (n << 4));

        U32 m = nr_map_6ctx(n, r);
        U32 l = nr_level_8ctx(n, r);
        U32 cpr = (r == 1 ? 2 : 0) + (r >= n ? 1 : 0);
        U32 gtc = gps_time_change ? 1 : 0;

        I32 median = c->last_X_diff_median5[(m << 1) | gtc].get();
        I32 diff = c->ic_dX.decompress(layer[L14_CHANNEL_RETURNS_XY].dec, median,
                                       n == 1);
        item.x = c->last.x + diff;
        c->last_X_diff_median5[(m << 1) | gtc].add(diff);

        U32 k_bits = c->ic_dX.getK();
        median = c->last_Y_diff_median5[(m << 1) | gtc].get();
        diff = c->ic_dY.decompress(
            layer[L14_CHANNEL_RETURNS_XY].dec, median,
            (n == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20));
        item.y = c->last.y + diff;
        c->last_Y_diff_median5[(m << 1) | gtc].add(diff);

        if (layer[L14_Z].present) {
            k_bits = (c->ic_dX.getK() + c->ic_dY.getK()) / 2;
            item.z = c->ic_Z.decompress(
                layer[L14_Z].dec, c->last_Z[l],
                (n == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18));
            c->last_Z[l] = item.z;
        } else {
            item.z = c->last_Z[l];
        }

        if (layer[L14_CLASSIFICATION].present) {
            U32 ccc = ((c->last.classification & 0x1F) << 1) + (cpr == 3 ? 1 : 0);
            item.classification = (U8)layer[L14_CLASSIFICATION].dec.decodeSymbol(
                c->lazy(c->m_classification, c->has_cls, ccc, 256));
        }
        if (layer[L14_FLAGS].present) {
            U32 last_flags = (c->last.edge_of_flight() << 5) |
                             (c->last.scan_direction() << 4) |
                             c->last.classification_flags();
            U32 flags = layer[L14_FLAGS].dec.decodeSymbol(
                c->lazy(c->m_flags, c->has_flg, last_flags, 64));
            item.flags_byte = (U8)((flags & 0x0F) | (current << 4) |
                                   (((flags >> 4) & 1) << 6) |
                                   (((flags >> 5) & 1) << 7));
        }
        if (layer[L14_INTENSITY].present) {
            U32 ii = (cpr << 1) | gtc;
            item.intensity = (U16)c->ic_intensity.decompress(
                layer[L14_INTENSITY].dec, c->last_intensity[ii], cpr);
            c->last_intensity[ii] = item.intensity;
        }
        if (scan_angle_change) {
            if (layer[L14_SCAN_ANGLE].present)
                item.scan_angle = (I16)(U16)c->ic_scan_angle.decompress(
                    layer[L14_SCAN_ANGLE].dec, (U16)c->last.scan_angle, gtc);
        }
        if (layer[L14_USER_DATA].present) {
            item.user_data = (U8)layer[L14_USER_DATA].dec.decodeSymbol(
                c->lazy(c->m_user_data, c->has_usr, c->last.user_data / 4, 256));
        }
        if (point_source_change && layer[L14_POINT_SOURCE].present) {
            item.point_source_ID = (U16)c->ic_point_source.decompress(
                layer[L14_POINT_SOURCE].dec, c->last.point_source_ID, 0);
        }
        if (gps_time_change && layer[L14_GPS_TIME].present) {
            U8 g8[8];
            c->gps.read(layer[L14_GPS_TIME].dec, g8);
            memcpy(&item.gps_time_bits, g8, 8);
        }
        item.to_bytes(out30);
        c->last = item;
        c->last_gps_time_change = gps_time_change;
    }
};

struct Point14v3Enc {
    Point14Ctx ctx[4];
    U32 current = 0;
    LayerEnc layer[L14_COUNT];
    bool changed_flag[L14_COUNT];

    void init(const U8* first_point) {
        for (int i = 0; i < 4; i++) ctx[i].unused = true;
        for (int i = 0; i < L14_COUNT; i++) {
            layer[i].reset();
            changed_flag[i] = false;
        }
        changed_flag[L14_CHANNEL_RETURNS_XY] = true;  // always emitted
        Point14 p;
        p.from_bytes(first_point);
        current = p.scanner_channel();
        ctx[current].create(true, p, false);
    }

    void write(const U8* in30) {
        Point14 item;
        item.from_bytes(in30);
        Point14Ctx* c = &ctx[current];
        U32 lr = c->last.return_number(), ln = c->last.number_of_returns();
        U32 lpr = (lr == 1 ? 1 : 0) + (lr >= ln ? 2 : 0) +
                  (c->last_gps_time_change ? 4 : 0);

        U32 sc = item.scanner_channel();
        bool channel_change = sc != current;
        // EVERY comparison below is made against the context the DECODER
        // will hold after the (potential) channel switch — the change
        // bits gate copy-vs-decode of values in THAT context, so using
        // the old context's last would desync used target contexts.
        // (A fresh target context is seeded from the old last, so the
        // two coincide there.)  The changed_values SYMBOL itself is
        // still coded with the OLD context's model/lpr, exactly as the
        // decoder reads it before learning of the switch.
        Point14Ctx* c_after = c;
        if (channel_change && !ctx[sc].unused) c_after = &ctx[sc];
        bool point_source_change =
            item.point_source_ID != c_after->last.point_source_ID;
        bool gps_time_change = item.gps_time_bits != c_after->last.gps_time_bits;
        bool scan_angle_change = item.scan_angle != c_after->last.scan_angle;
        U32 n = item.number_of_returns(), r = item.return_number();
        U32 changed = (channel_change ? (1u << 6) : 0) |
                      (point_source_change ? (1u << 5) : 0) |
                      (gps_time_change ? (1u << 4) : 0) |
                      (scan_angle_change ? (1u << 3) : 0);
        U32 lr2 = c_after->last.return_number(),
            ln2 = c_after->last.number_of_returns();
        U32 rbits;
        if (r == lr2) rbits = 0;
        else if (r == ((lr2 + 1) & 15)) rbits = 1;
        else if (r == ((lr2 + 15) & 15)) rbits = 2;
        else rbits = 3;
        if (n != ln2) changed |= (1u << 2);
        changed |= rbits;

        Encoder& exy = layer[L14_CHANNEL_RETURNS_XY].enc;
        exy.encodeSymbol(c->m_changed_values[lpr], changed);
        if (channel_change) {
            U32 diff = (sc + 4 - current - 1) & 3;
            exy.encodeSymbol(c->m_scanner_channel, diff);
            if (ctx[sc].unused)
                ctx[sc].create(true, c->last, c->last_gps_time_change);
            current = sc;
            c = &ctx[current];
        }
        if (changed & (1u << 2))
            exy.encodeSymbol(
                c->lazy(c->m_number_of_returns, c->has_nr,
                        c->last.number_of_returns(), 16),
                n);
        if (rbits == 3) {
            if (gps_time_change)
                exy.encodeSymbol(
                    c->lazy(c->m_return_number, c->has_rn,
                            c->last.return_number(), 16),
                    r);
            else
                exy.encodeSymbol(
                    c->m_return_number_gps_same,
                    (r + 16 - c->last.return_number() - 2) & 15);
        }

        U32 m = nr_map_6ctx(n, r);
        U32 l = nr_level_8ctx(n, r);
        U32 cpr = (r == 1 ? 2 : 0) + (r >= n ? 1 : 0);
        U32 gtc = gps_time_change ? 1 : 0;

        I32 median = c->last_X_diff_median5[(m << 1) | gtc].get();
        I32 diff = item.x - c->last.x;
        c->ic_dX.compress(exy, median, item.x - c->last.x, n == 1);
        c->last_X_diff_median5[(m << 1) | gtc].add(diff);

        U32 k_bits = c->ic_dX.getK();
        median = c->last_Y_diff_median5[(m << 1) | gtc].get();
        diff = item.y - c->last.y;
        c->ic_dY.compress(exy, median, diff,
                          (n == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20));
        c->last_Y_diff_median5[(m << 1) | gtc].add(diff);

        k_bits = (c->ic_dX.getK() + c->ic_dY.getK()) / 2;
        c->ic_Z.compress(layer[L14_Z].enc, c->last_Z[l], item.z,
                         (n == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18));
        if (item.z != c->last_Z[l]) changed_flag[L14_Z] = true;
        c->last_Z[l] = item.z;

        {
            U32 ccc = ((c->last.classification & 0x1F) << 1) + (cpr == 3 ? 1 : 0);
            layer[L14_CLASSIFICATION].enc.encodeSymbol(
                c->lazy(c->m_classification, c->has_cls, ccc, 256),
                item.classification);
            if (item.classification != c->last.classification)
                changed_flag[L14_CLASSIFICATION] = true;
        }
        {
            U32 last_flags = (c->last.edge_of_flight() << 5) |
                             (c->last.scan_direction() << 4) |
                             c->last.classification_flags();
            U32 flags = (item.edge_of_flight() << 5) |
                        (item.scan_direction() << 4) |
                        item.classification_flags();
            layer[L14_FLAGS].enc.encodeSymbol(
                c->lazy(c->m_flags, c->has_flg, last_flags, 64), flags);
            if (flags != last_flags) changed_flag[L14_FLAGS] = true;
        }
        {
            U32 ii = (cpr << 1) | gtc;
            c->ic_intensity.compress(layer[L14_INTENSITY].enc,
                                     c->last_intensity[ii], item.intensity, cpr);
            if (item.intensity != c->last.intensity)
                changed_flag[L14_INTENSITY] = true;
            c->last_intensity[ii] = item.intensity;
        }
        if (scan_angle_change) {
            c->ic_scan_angle.compress(layer[L14_SCAN_ANGLE].enc,
                                      (U16)c->last.scan_angle,
                                      (U16)item.scan_angle, gtc);
            changed_flag[L14_SCAN_ANGLE] = true;
        }
        {
            layer[L14_USER_DATA].enc.encodeSymbol(
                c->lazy(c->m_user_data, c->has_usr, c->last.user_data / 4, 256),
                item.user_data);
            if (item.user_data != c->last.user_data)
                changed_flag[L14_USER_DATA] = true;
        }
        if (point_source_change) {
            c->ic_point_source.compress(layer[L14_POINT_SOURCE].enc,
                                        c->last.point_source_ID,
                                        item.point_source_ID, 0);
            changed_flag[L14_POINT_SOURCE] = true;
        }
        if (gps_time_change) {
            U8 g8[8];
            memcpy(g8, &item.gps_time_bits, 8);
            c->gps.write(layer[L14_GPS_TIME].enc, g8);
            changed_flag[L14_GPS_TIME] = true;
        }
        c->last = item;
        c->last_gps_time_change = gps_time_change;
    }
};

// ---- RGB14 v3 (one layer) + NIR14 (second layer of RGBNIR14)
struct Rgb14Ctx {
    bool unused = true;
    Rgb12Codec rgb;  // reuses the v2 byte-delta scheme per context
};

struct Rgb14v3 {
    Rgb14Ctx ctx[4];
    U32 current = 0;
    bool compressing = false;

    void init(const U8* first6, U32 context, bool compr) {
        compressing = compr;
        for (int i = 0; i < 4; i++) ctx[i].unused = true;
        current = context;
        ctx[current].rgb.setup(compr);
        ctx[current].rgb.init(first6);
        ctx[current].unused = false;
    }
    void switch_ctx(U32 context) {
        if (context == current) return;
        if (ctx[context].unused) {
            U8 seed[6];
            wr_u16(seed, ctx[current].rgb.last_r);
            wr_u16(seed + 2, ctx[current].rgb.last_g);
            wr_u16(seed + 4, ctx[current].rgb.last_b);
            ctx[context].rgb.setup(compressing);
            ctx[context].rgb.init(seed);
            ctx[context].unused = false;
        }
        current = context;
    }
    void read(Decoder& dec, U8* out6, U32 context) {
        switch_ctx(context);
        ctx[current].rgb.read(dec, out6);
    }
    bool write(Encoder& enc, const U8* in6, U32 context) {
        switch_ctx(context);
        Rgb12Codec& rc = ctx[current].rgb;
        bool changed = rd_u16(in6) != rc.last_r || rd_u16(in6 + 2) != rc.last_g ||
                       rd_u16(in6 + 4) != rc.last_b;
        rc.write(enc, in6);
        return changed;
    }
};

struct Nir14Ctx {
    bool unused = true;
    U16 last_nir = 0;
    SymbolModel m_used;     // 4 syms: lo/hi byte changed bits
    SymbolModel m_diff[2];  // 256 each
};

struct Nir14v3 {
    Nir14Ctx ctx[4];
    U32 current = 0;
    bool compressing = false;

    void create(U32 i, U16 seed) {
        ctx[i].m_used.setup(4, compressing);
        ctx[i].m_diff[0].setup(256, compressing);
        ctx[i].m_diff[1].setup(256, compressing);
        ctx[i].last_nir = seed;
        ctx[i].unused = false;
    }
    void init(const U8* first2, U32 context, bool compr) {
        compressing = compr;
        for (int i = 0; i < 4; i++) ctx[i].unused = true;
        current = context;
        create(current, rd_u16(first2));
    }
    void switch_ctx(U32 context) {
        if (context == current) return;
        if (ctx[context].unused) create(context, ctx[current].last_nir);
        current = context;
    }
    void read(Decoder& dec, U8* out2, U32 context) {
        switch_ctx(context);
        Nir14Ctx& c = ctx[current];
        U32 sym = dec.decodeSymbol(c.m_used);
        U8 lo = c.last_nir & 255, hi = c.last_nir >> 8;
        if (sym & 1) lo = u8_fold((I32)dec.decodeSymbol(c.m_diff[0]) + lo);
        if (sym & 2) hi = u8_fold((I32)dec.decodeSymbol(c.m_diff[1]) + hi);
        c.last_nir = (U16)(lo | (hi << 8));
        wr_u16(out2, c.last_nir);
    }
    bool write(Encoder& enc, const U8* in2, U32 context) {
        switch_ctx(context);
        Nir14Ctx& c = ctx[current];
        U16 nir = rd_u16(in2);
        U32 sym = (((c.last_nir & 255) != (nir & 255)) ? 1u : 0u) |
                  (((c.last_nir >> 8) != (nir >> 8)) ? 2u : 0u);
        enc.encodeSymbol(c.m_used, sym);
        if (sym & 1)
            enc.encodeSymbol(c.m_diff[0],
                             u8_fold((I32)(nir & 255) - (I32)(c.last_nir & 255)));
        if (sym & 2)
            enc.encodeSymbol(c.m_diff[1],
                             u8_fold((I32)(nir >> 8) - (I32)(c.last_nir >> 8)));
        bool changed = nir != c.last_nir;
        c.last_nir = nir;
        return changed;
    }
};

// ---- WAVEPACKET14 v3 (one layer; 29-byte item)
struct Wp14Ctx {
    bool unused = true;
    U8 last[29];
    U32 sym_last_offset_diff = 0;
    I32 last_diff_32 = 0;
    SymbolModel m_packet_index;
    SymbolModel m_offset_diff[4];
    IntegerCompressor ic_offset_diff, ic_packet_size, ic_return_point, ic_xyz;
};

struct Wavepacket14v3 {
    Wp14Ctx ctx[4];
    U32 current = 0;
    bool compressing = false;

    void create(U32 i, const U8* seed) {
        Wp14Ctx& c = ctx[i];
        c.m_packet_index.setup(256, compressing);
        for (int k = 0; k < 4; k++) c.m_offset_diff[k].setup(4, compressing);
        c.ic_offset_diff.setup(32, 1, compressing);
        c.ic_packet_size.setup(32, 1, compressing);
        c.ic_return_point.setup(32, 1, compressing);
        c.ic_xyz.setup(32, 3, compressing);
        memcpy(c.last, seed, 29);
        c.sym_last_offset_diff = 0;
        c.last_diff_32 = 0;
        c.unused = false;
    }
    void init(const U8* first29, U32 context, bool compr) {
        compressing = compr;
        for (int i = 0; i < 4; i++) ctx[i].unused = true;
        current = context;
        create(current, first29);
    }
    void switch_ctx(U32 context) {
        if (context == current) return;
        if (ctx[context].unused) create(context, ctx[current].last);
        current = context;
    }
    static U64 rd_u64(const U8* p) { U64 v; memcpy(&v, p, 8); return v; }
    static void wr_u64(U8* p, U64 v) { memcpy(p, &v, 8); }

    void read(Decoder& dec, U8* out29, U32 context) {
        switch_ctx(context);
        Wp14Ctx& c = ctx[current];
        out29[0] = (U8)dec.decodeSymbol(c.m_packet_index);
        U64 last_offset = rd_u64(c.last + 1);
        U32 last_size = (U32)rd_i32(c.last + 9);
        U32 sym = dec.decodeSymbol(c.m_offset_diff[c.sym_last_offset_diff]);
        c.sym_last_offset_diff = sym;
        U64 offset;
        if (sym == 0) {
            offset = last_offset;
        } else if (sym == 1) {
            offset = last_offset + last_size;
        } else if (sym == 2) {
            c.last_diff_32 = c.ic_offset_diff.decompress(dec, c.last_diff_32, 0);
            offset = (U64)((I64)last_offset + c.last_diff_32);
        } else {
            U64 lo = dec.readInt();
            U64 hi = dec.readInt();
            offset = lo | (hi << 32);
        }
        wr_u64(out29 + 1, offset);
        wr_i32(out29 + 9, c.ic_packet_size.decompress(dec, (I32)last_size, 0));
        wr_i32(out29 + 13,
               c.ic_return_point.decompress(dec, rd_i32(c.last + 13), 0));
        wr_i32(out29 + 17, c.ic_xyz.decompress(dec, rd_i32(c.last + 17), 0));
        wr_i32(out29 + 21, c.ic_xyz.decompress(dec, rd_i32(c.last + 21), 1));
        wr_i32(out29 + 25, c.ic_xyz.decompress(dec, rd_i32(c.last + 25), 2));
        memcpy(c.last, out29, 29);
    }
    bool write(Encoder& enc, const U8* in29, U32 context) {
        switch_ctx(context);
        Wp14Ctx& c = ctx[current];
        bool changed = memcmp(in29, c.last, 29) != 0;
        enc.encodeSymbol(c.m_packet_index, in29[0]);
        U64 last_offset = rd_u64(c.last + 1);
        U32 last_size = (U32)rd_i32(c.last + 9);
        U64 offset = rd_u64(in29 + 1);
        U32 sym;
        if (offset == last_offset) sym = 0;
        else if (offset == last_offset + last_size) sym = 1;
        else {
            I64 d = (I64)offset - (I64)last_offset;
            sym = ((I64)(I32)d == d) ? 2 : 3;
        }
        enc.encodeSymbol(c.m_offset_diff[c.sym_last_offset_diff], sym);
        c.sym_last_offset_diff = sym;
        if (sym == 2) {
            I32 d = (I32)((I64)offset - (I64)last_offset);
            c.ic_offset_diff.compress(enc, c.last_diff_32, d, 0);
            c.last_diff_32 = d;
        } else if (sym == 3) {
            enc.writeInt((U32)offset);
            enc.writeInt((U32)(offset >> 32));
        }
        c.ic_packet_size.compress(enc, (I32)last_size, rd_i32(in29 + 9), 0);
        c.ic_return_point.compress(enc, rd_i32(c.last + 13), rd_i32(in29 + 13), 0);
        c.ic_xyz.compress(enc, rd_i32(c.last + 17), rd_i32(in29 + 17), 0);
        c.ic_xyz.compress(enc, rd_i32(c.last + 21), rd_i32(in29 + 21), 1);
        c.ic_xyz.compress(enc, rd_i32(c.last + 25), rd_i32(in29 + 25), 2);
        memcpy(c.last, in29, 29);
        return changed;
    }
};

// ---- format 6-10 record layout
struct Format14Layout {
    bool has_rgb, has_nir, has_wave;
    int record_len;
    int rgb_off, nir_off, wave_off;
};

bool layout14_for(int fmt, Format14Layout* L) {
    switch (fmt) {
        case 6: *L = {false, false, false, 30, 0, 0, 0}; return true;
        case 7: *L = {true, false, false, 36, 30, 0, 0}; return true;
        case 8: *L = {true, true, false, 38, 30, 36, 0}; return true;
        case 9: *L = {false, false, true, 59, 0, 0, 30}; return true;
        case 10: *L = {true, true, true, 67, 30, 36, 38}; return true;
        default: return false;
    }
}

// --------------------------------------------------------- chunk layout

struct FormatLayout {
    bool has_gps, has_rgb;
    int record_len;
    int gps_off, rgb_off;
};

bool layout_for(int fmt, FormatLayout* L) {
    switch (fmt) {
        case 0: *L = {false, false, 20, 0, 0}; return true;
        case 1: *L = {true, false, 28, 20, 0}; return true;
        case 2: *L = {false, true, 26, 0, 20}; return true;
        case 3: *L = {true, true, 34, 20, 28}; return true;
        default: return false;
    }
}

// shared chunk-table reader: fills starts (byte offsets within `data`)
// and, for variable-size chunks (chunk_size == U32_MAX), per-chunk
// point counts.  Returns number of chunks, or -1 on error.
long long read_chunk_table(const U8* data, long long data_len,
                           long long table_rel, unsigned chunk_size,
                           long long n_points, int min_chunk_bytes,
                           std::vector<I64>& starts,
                           std::vector<I64>& counts) {
    if (table_rel < 0 || table_rel + 8 > data_len) return -1;
    U32 version, num_chunks;
    memcpy(&version, data + table_rel, 4);
    memcpy(&num_chunks, data + table_rel + 4, 4);
    if (version != 0) return -1;
    bool variable = chunk_size == 0xFFFFFFFFu;
    if (!variable) {
        long long expect = (n_points + chunk_size - 1) / chunk_size;
        if ((long long)num_chunks != expect) return -1;
    } else if (num_chunks == 0 || num_chunks > (U32)n_points) {
        return -1;
    }
    starts.assign(num_chunks + 1, 0);
    counts.assign(num_chunks, 0);
    Decoder dec;
    dec.init(data + table_rel + 8, (size_t)(data_len - table_rel - 8));
    IntegerCompressor ic;
    ic.setup(32, 2, false);
    I32 prev_cnt = 0, prev_sz = 0;
    long long total_cnt = 0;
    for (U32 i = 0; i < num_chunks; i++) {
        if (variable) {
            I32 cnt = ic.decompress(dec, prev_cnt, 0);
            prev_cnt = cnt;
            counts[i] = cnt;
            total_cnt += cnt;
            if (cnt <= 0) return -1;
        }
        I32 sz = ic.decompress(dec, prev_sz, 1);
        prev_sz = sz;
        starts[i + 1] = starts[i] + sz;
        if (sz < min_chunk_bytes || starts[i + 1] > table_rel) return -1;
    }
    if (variable && total_cnt < n_points) return -1;
    return (long long)num_chunks;
}

}  // namespace

extern "C" {

// Decode a LAZ point-data section.  `data` spans the section EXCLUDING
// the leading 8-byte chunk-table offset; `table_rel` is the chunk
// table's offset within `data`.  Returns points decoded, or -1 on error.
long long laz_decode_points(const unsigned char* data, long long data_len,
                            long long table_rel, long long n_points, int fmt,
                            unsigned int chunk_size, unsigned char* out) {
    FormatLayout L;
    if (!layout_for(fmt, &L)) return -1;
    if (chunk_size == 0) return -1;
    bool variable = chunk_size == 0xFFFFFFFFu;

    std::vector<I64> chunk_starts, chunk_counts;
    long long num_chunks = read_chunk_table(
        data, data_len, table_rel, chunk_size, n_points, L.record_len,
        chunk_starts, chunk_counts);
    if (num_chunks < 0) return -1;

    Point10Codec p10;
    GpsTime11Codec gps;
    Rgb12Codec rgb;
    p10.setup(false);
    if (L.has_gps) gps.setup(false);
    if (L.has_rgb) rgb.setup(false);

    long long done = 0;
    for (long long c = 0; c < num_chunks && done < n_points; c++) {
        const U8* cp = data + chunk_starts[c];
        long long cbytes = chunk_starts[c + 1] - chunk_starts[c];
        long long in_chunk = n_points - done;
        long long cap_chunk = variable ? chunk_counts[c] : (long long)chunk_size;
        if (in_chunk > cap_chunk) in_chunk = cap_chunk;
        // first point raw
        U8* o = out + done * L.record_len;
        memcpy(o, cp, L.record_len);
        p10.init(cp);
        if (L.has_gps) gps.init(cp + L.gps_off);
        if (L.has_rgb) rgb.init(cp + L.rgb_off);
        Decoder dec;
        dec.init(cp + L.record_len, (size_t)(cbytes - L.record_len));
        for (long long i = 1; i < in_chunk; i++) {
            U8* oi = out + (done + i) * L.record_len;
            p10.read(dec, oi);
            if (L.has_gps) gps.read(dec, oi + L.gps_off);
            if (L.has_rgb) rgb.read(dec, oi + L.rgb_off);
        }
        done += in_chunk;
    }
    return done;
}

// Encode raw LAS records to a LAZ point-data section (chunks + chunk
// table, WITHOUT the leading 8-byte table-offset field).  On success
// returns total section bytes and sets *table_rel to the chunk table's
// offset within the section; returns -1 on error, -2 if out_cap is too
// small.
long long laz_encode_points(const unsigned char* records, long long n,
                            int fmt, unsigned int chunk_size,
                            unsigned char* out, long long out_cap,
                            long long* table_rel) {
    FormatLayout L;
    if (!layout_for(fmt, &L)) return -1;
    if (chunk_size == 0 || n <= 0) return -1;

    std::vector<U8> buf;
    buf.reserve((size_t)(n * L.record_len / 2 + 1024));
    long long num_chunks = (n + chunk_size - 1) / chunk_size;
    std::vector<I64> chunk_bytes(num_chunks);

    Point10Codec p10;
    GpsTime11Codec gps;
    Rgb12Codec rgb;
    p10.setup(true);
    if (L.has_gps) gps.setup(true);
    if (L.has_rgb) rgb.setup(true);

    long long done = 0;
    for (long long c = 0; c < num_chunks; c++) {
        long long in_chunk = n - done;
        if (in_chunk > (long long)chunk_size) in_chunk = chunk_size;
        size_t chunk_start = buf.size();
        const U8* first = records + done * L.record_len;
        buf.insert(buf.end(), first, first + L.record_len);
        p10.init(first);
        if (L.has_gps) gps.init(first + L.gps_off);
        if (L.has_rgb) rgb.init(first + L.rgb_off);
        Encoder enc;
        enc.init(&buf);
        for (long long i = 1; i < in_chunk; i++) {
            const U8* ri = records + (done + i) * L.record_len;
            p10.write(enc, ri);
            if (L.has_gps) gps.write(enc, ri + L.gps_off);
            if (L.has_rgb) rgb.write(enc, ri + L.rgb_off);
        }
        enc.done();
        chunk_bytes[c] = (I64)(buf.size() - chunk_start);
        done += in_chunk;
    }

    // ---- chunk table
    long long table_at = (long long)buf.size();
    U32 version = 0, nc32 = (U32)num_chunks;
    buf.insert(buf.end(), (U8*)&version, (U8*)&version + 4);
    buf.insert(buf.end(), (U8*)&nc32, (U8*)&nc32 + 4);
    {
        Encoder enc;
        enc.init(&buf);
        IntegerCompressor ic;
        ic.setup(32, 2, true);
        I32 prev = 0;
        for (long long i = 0; i < num_chunks; i++) {
            ic.compress(enc, prev, (I32)chunk_bytes[i], 1);
            prev = (I32)chunk_bytes[i];
        }
        enc.done();
    }

    if ((long long)buf.size() > out_cap) return -2;
    memcpy(out, buf.data(), buf.size());
    *table_rel = table_at;
    return (long long)buf.size();
}

// ---- LAS 1.4 layered (compressor 3, item version 3), formats 6-10.
// Chunk layout: [raw first point][u32 point count][u32 size per layer]
// [layer bytes...].  Variable-size chunks (chunk_size == 0xFFFFFFFF)
// take per-chunk counts from the chunk table.
long long laz_decode_points14(const unsigned char* data, long long data_len,
                              long long table_rel, long long n_points,
                              int fmt, unsigned int chunk_size,
                              unsigned char* out) {
    Format14Layout L;
    if (!layout14_for(fmt, &L)) return -1;
    if (chunk_size == 0) return -1;
    bool variable = chunk_size == 0xFFFFFFFFu;

    int n_layers = L14_COUNT + (L.has_rgb ? 1 : 0) + (L.has_nir ? 1 : 0) +
                   (L.has_wave ? 1 : 0);
    std::vector<I64> chunk_starts, chunk_counts;
    long long num_chunks = read_chunk_table(
        data, data_len, table_rel, chunk_size, n_points,
        L.record_len + 4 + 4 * n_layers, chunk_starts, chunk_counts);
    if (num_chunks < 0) return -1;

    Point14v3Dec p14;
    Rgb14v3 rgb;
    Nir14v3 nir;
    Wavepacket14v3 wave;
    LayerDec rgb_layer, nir_layer, wave_layer;

    long long done = 0;
    for (long long c = 0; c < num_chunks && done < n_points; c++) {
        const U8* cp = data + chunk_starts[c];
        long long cbytes = chunk_starts[c + 1] - chunk_starts[c];
        long long in_chunk = n_points - done;
        long long cap_chunk = variable ? chunk_counts[c] : (long long)chunk_size;
        if (in_chunk > cap_chunk) in_chunk = cap_chunk;

        // raw first point
        U8* o = out + done * L.record_len;
        memcpy(o, cp, L.record_len);
        long long pos = L.record_len;
        if (pos + 4 + 4 * n_layers > cbytes) return -1;
        U32 stored_count;
        memcpy(&stored_count, cp + pos, 4);
        pos += 4;
        if ((long long)stored_count != in_chunk) return -1;
        std::vector<U32> sizes(n_layers);
        for (int i = 0; i < n_layers; i++) {
            memcpy(&sizes[i], cp + pos, 4);
            pos += 4;
        }
        long long total = 0;
        for (int i = 0; i < n_layers; i++) total += sizes[i];
        if (pos + total > cbytes) return -1;
        int li = 0;
        for (; li < L14_COUNT; li++) {
            p14.layer[li].attach(cp + pos, sizes[li]);
            pos += sizes[li];
        }
        if (L.has_rgb) { rgb_layer.attach(cp + pos, sizes[li]); pos += sizes[li]; li++; }
        if (L.has_nir) { nir_layer.attach(cp + pos, sizes[li]); pos += sizes[li]; li++; }
        if (L.has_wave) { wave_layer.attach(cp + pos, sizes[li]); pos += sizes[li]; li++; }

        p14.init(o);
        U32 ctx0 = p14.current;
        if (L.has_rgb) rgb.init(o + L.rgb_off, ctx0, false);
        if (L.has_nir) nir.init(o + L.nir_off, ctx0, false);
        if (L.has_wave) wave.init(o + L.wave_off, ctx0, false);

        for (long long i = 1; i < in_chunk; i++) {
            U8* oi = out + (done + i) * L.record_len;
            p14.read(oi);
            U32 cc = p14.current;
            if (L.has_rgb) {
                if (rgb_layer.present) rgb.read(rgb_layer.dec, oi + L.rgb_off, cc);
                else {
                    rgb.switch_ctx(cc);
                    Rgb12Codec& rc = rgb.ctx[cc].rgb;
                    wr_u16(oi + L.rgb_off, rc.last_r);
                    wr_u16(oi + L.rgb_off + 2, rc.last_g);
                    wr_u16(oi + L.rgb_off + 4, rc.last_b);
                }
            }
            if (L.has_nir) {
                if (nir_layer.present) nir.read(nir_layer.dec, oi + L.nir_off, cc);
                else {
                    nir.switch_ctx(cc);
                    wr_u16(oi + L.nir_off, nir.ctx[cc].last_nir);
                }
            }
            if (L.has_wave) {
                if (wave_layer.present) wave.read(wave_layer.dec, oi + L.wave_off, cc);
                else {
                    wave.switch_ctx(cc);
                    memcpy(oi + L.wave_off, wave.ctx[cc].last, 29);
                }
            }
        }
        done += in_chunk;
    }
    return done;
}

long long laz_encode_points14(const unsigned char* records, long long n,
                              int fmt, unsigned int chunk_size,
                              unsigned char* out, long long out_cap,
                              long long* table_rel) {
    Format14Layout L;
    if (!layout14_for(fmt, &L)) return -1;
    if (chunk_size == 0 || chunk_size == 0xFFFFFFFFu || n <= 0) return -1;

    int n_layers = L14_COUNT + (L.has_rgb ? 1 : 0) + (L.has_nir ? 1 : 0) +
                   (L.has_wave ? 1 : 0);
    std::vector<U8> buf;
    buf.reserve((size_t)(n * L.record_len / 2 + 1024));
    long long num_chunks = (n + chunk_size - 1) / chunk_size;
    std::vector<I64> chunk_bytes(num_chunks);

    Point14v3Enc p14;
    Rgb14v3 rgb;
    Nir14v3 nir;
    Wavepacket14v3 wave;
    LayerEnc rgb_layer, nir_layer, wave_layer;

    long long done = 0;
    for (long long c = 0; c < num_chunks; c++) {
        long long in_chunk = n - done;
        if (in_chunk > (long long)chunk_size) in_chunk = chunk_size;
        size_t chunk_start = buf.size();
        const U8* first = records + done * L.record_len;
        buf.insert(buf.end(), first, first + L.record_len);

        p14.init(first);
        U32 ctx0 = p14.current;
        rgb_layer.reset();
        nir_layer.reset();
        wave_layer.reset();
        bool rgb_changed = false, nir_changed = false, wave_changed = false;
        if (L.has_rgb) rgb.init(first + L.rgb_off, ctx0, true);
        if (L.has_nir) nir.init(first + L.nir_off, ctx0, true);
        if (L.has_wave) wave.init(first + L.wave_off, ctx0, true);

        for (long long i = 1; i < in_chunk; i++) {
            const U8* ri = records + (done + i) * L.record_len;
            p14.write(ri);
            U32 cc = p14.current;
            if (L.has_rgb)
                rgb_changed |= rgb.write(rgb_layer.enc, ri + L.rgb_off, cc);
            if (L.has_nir)
                nir_changed |= nir.write(nir_layer.enc, ri + L.nir_off, cc);
            if (L.has_wave)
                wave_changed |= wave.write(wave_layer.enc, ri + L.wave_off, cc);
        }

        // close all layers; unchanged optional layers emit 0 bytes
        U32 sizes[16];
        int li = 0;
        for (; li < L14_COUNT; li++) {
            U32 sz = p14.layer[li].close();
            sizes[li] = p14.changed_flag[li] ? sz : 0;
        }
        if (L.has_rgb) sizes[li++] = rgb_changed ? rgb_layer.close() : (rgb_layer.close(), 0);
        if (L.has_nir) sizes[li++] = nir_changed ? nir_layer.close() : (nir_layer.close(), 0);
        if (L.has_wave) sizes[li++] = wave_changed ? wave_layer.close() : (wave_layer.close(), 0);

        U32 cnt = (U32)in_chunk;
        buf.insert(buf.end(), (U8*)&cnt, (U8*)&cnt + 4);
        for (int i = 0; i < n_layers; i++)
            buf.insert(buf.end(), (U8*)&sizes[i], (U8*)&sizes[i] + 4);
        li = 0;
        for (; li < L14_COUNT; li++)
            if (sizes[li])
                buf.insert(buf.end(), p14.layer[li].buf.begin(),
                           p14.layer[li].buf.end());
        if (L.has_rgb) {
            if (sizes[li]) buf.insert(buf.end(), rgb_layer.buf.begin(), rgb_layer.buf.end());
            li++;
        }
        if (L.has_nir) {
            if (sizes[li]) buf.insert(buf.end(), nir_layer.buf.begin(), nir_layer.buf.end());
            li++;
        }
        if (L.has_wave) {
            if (sizes[li]) buf.insert(buf.end(), wave_layer.buf.begin(), wave_layer.buf.end());
            li++;
        }
        chunk_bytes[c] = (I64)(buf.size() - chunk_start);
        done += in_chunk;
    }

    // ---- chunk table (same coding as the v2 container)
    long long table_at = (long long)buf.size();
    U32 version = 0, nc32 = (U32)num_chunks;
    buf.insert(buf.end(), (U8*)&version, (U8*)&version + 4);
    buf.insert(buf.end(), (U8*)&nc32, (U8*)&nc32 + 4);
    {
        Encoder enc;
        enc.init(&buf);
        IntegerCompressor ic;
        ic.setup(32, 2, true);
        I32 prev = 0;
        for (long long i = 0; i < num_chunks; i++) {
            ic.compress(enc, prev, (I32)chunk_bytes[i], 1);
            prev = (I32)chunk_bytes[i];
        }
        enc.done();
    }

    if ((long long)buf.size() > out_cap) return -2;
    memcpy(out, buf.data(), buf.size());
    *table_rel = table_at;
    return (long long)buf.size();
}

}  // extern "C"
