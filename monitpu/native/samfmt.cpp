// Batched SAM text formatting (single-end).
//
// Emits byte-identical output to align/sam.py write_sam_record (itself
// a field-for-field mirror of the reference's write_sam, reference
// include/common/sam.hpp:144-188 incl. the OA/AA custom tags), plus
// the BWA-MEM SE MAPQ (mapq.hpp:146-184) that the Python assembly loop
// computed per record. One call formats a whole batch into one buffer,
// replacing ~B SamRecord object constructions + string formatting on
// the host critical path (VERDICT r2 weak #9).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

constexpr char DEC[6] = {'$', 'A', 'C', 'G', 'T', 'N'};
const char OPS[3] = {'M', 'I', 'D'};

struct Out {
  char* p;
  char* end;
  bool trunc = false;
  void put(char c) {
    if (p < end)
      *p++ = c;
    else
      trunc = true;
  }
  void str(const char* s, int64_t l) {
    if (p + l <= end) {
      memcpy(p, s, l);
      p += l;
    } else {
      trunc = true;
    }
  }
  void cstr(const char* s) { str(s, (int64_t)strlen(s)); }
  void num(int64_t v) {
    char b[24];
    int n = snprintf(b, sizeof b, "%lld", (long long)v);
    str(b, n);
  }
  void cigar(const uint32_t* c, int32_t n) {
    if (n == 0) {
      put('*');
      return;
    }
    for (int32_t k = 0; k < n; ++k) {
      num(c[k] >> 4);
      put(OPS[c[k] & 0xF]);
    }
  }
};

// compute_mapq_se_bwa (align/mapq.py; mapq.hpp:146-184), sub_n=0
int32_t mapq_se(int64_t score, int64_t score2, int64_t rlen, int64_t qlen,
                int32_t min_seed_length, int32_t match, int32_t mismatch) {
  int64_t l = rlen > qlen ? rlen : qlen;
  int64_t sub = score2 ? score2 : (int64_t)min_seed_length * match;
  if (sub >= score) return 0;
  double identity =
      1.0 - double(l * match - score) / (match + mismatch) / double(l);
  int64_t mapq;
  if (score == 0) {
    mapq = 0;
  } else {
    double tmp = (l < 50) ? 1.0 : 3.0 / std::log((double)l);
    tmp *= identity * identity;
    mapq = (int64_t)(6.02 * double(score - sub) / match * tmp * tmp + .499);
  }
  if (mapq > 60) mapq = 60;
  if (mapq < 0) mapq = 0;
  return (int32_t)mapq;
}

}  // namespace

extern "C" {

// Returns 0 ok, 1 truncated (caller must fall back / enlarge).
int monitpu_format_sam_se(
    int64_t B, int64_t M,
    // SeOut arrays (monitpu_postseed_se outputs)
    const int32_t* flag, const int32_t* rname, const int64_t* pos,
    const int32_t* asc, const int32_t* zs, const int32_t* nm,
    const int32_t* rlen, const uint32_t* cigar, const int32_t* ncigar,
    const char* md, const int32_t* lift_rname, const int64_t* lift_pos,
    const uint32_t* lift_cigar, const int32_t* lift_ncigar,
    const char* lift_md, const int32_t* lift_nm, const uint8_t* unmapped_lft,
    const int32_t* alt_rname, const int64_t* alt_pos,
    const int32_t* alt_score, const int32_t* nalt, int32_t alt_cap,
    int32_t cigar_cap, int32_t md_cap,
    // read data
    const int8_t* rc_codes, const int32_t* lens,  // [B, M] rc lanes
    const char* qname_blob, const int64_t* qname_off,
    const char* seq_blob, const int64_t* seq_off,
    const char* qual_blob, const int64_t* qual_off,
    // reference names
    const char* name_blob, const int64_t* name_off, int32_t nseq,
    // mapq params
    int32_t min_len, int32_t smatch, int32_t smismatch,
    // output
    char* out, int64_t out_cap, int64_t* out_len) {
  Out o{out, out + out_cap};
  for (int64_t b = 0; b < B; ++b) {
    int32_t f = flag[b];
    bool mapped_line = !(f & 4) || unmapped_lft[b];
    bool star_rname = (f & 4) || unmapped_lft[b] || rname[b] < 0;
    int32_t mq = 255;
    if (!(f & 4))
      mq = mapq_se(asc[b], zs[b], unmapped_lft[b] ? 0 : rlen[b], lens[b],
                   min_len, smatch, smismatch);
    o.str(qname_blob + qname_off[b], qname_off[b + 1] - qname_off[b] - 1);
    o.put('\t');
    o.num(f);
    o.put('\t');
    if (star_rname) {
      o.put('*');
    } else {
      o.str(name_blob + name_off[rname[b]],
            name_off[rname[b] + 1] - name_off[rname[b]] - 1);
    }
    o.put('\t');
    o.num((f & 4) || unmapped_lft[b] ? 0 : pos[b]);
    o.put('\t');
    o.num((f & 4) ? 255 : mq);
    o.put('\t');
    if ((f & 4) || unmapped_lft[b])
      o.put('*');
    else
      o.cigar(cigar + b * cigar_cap, ncigar[b]);
    o.cstr("\t*\t0\t0\t");
    int64_t slen = seq_off[b + 1] - seq_off[b] - 1;
    int64_t qlen = qual_off[b + 1] - qual_off[b] - 1;
    if (f & 16) {  // reverse-complement read, reversed qual
      for (int32_t k = 0; k < lens[b]; ++k)
        o.put(DEC[rc_codes[b * M + k]]);
      o.put('\t');
      if (qlen <= 0) {
        o.put('*');
      } else {
        const char* q = qual_blob + qual_off[b];
        for (int64_t k = qlen - 1; k >= 0; --k) o.put(q[k]);
      }
    } else {
      if (slen <= 0)
        o.put('*');
      else
        o.str(seq_blob + seq_off[b], slen);
      o.put('\t');
      if (qlen <= 0)
        o.put('*');
      else
        o.str(qual_blob + qual_off[b], qlen);
    }
    if (mapped_line) {
      o.cstr("\tAS:i:");
      o.num(asc[b]);
      o.cstr("\tNM:i:");
      o.num(nm[b]);
      if (zs[b] > 0) {
        o.cstr("\tZS:i:");
        o.num(zs[b]);
      }
      o.cstr("\tMD:Z:");
      o.cstr(md + b * md_cap);  // NUL-terminated by the runtime
      o.cstr("\tOA:Z:");
      if (lift_rname[b] >= 0)
        o.str(name_blob + name_off[lift_rname[b]],
              name_off[lift_rname[b] + 1] - name_off[lift_rname[b]] - 1);
      else
        o.put('*');
      o.put(',');
      o.num(lift_pos[b]);
      o.put(',');
      o.put((f & 16) ? '-' : '+');
      o.put(',');
      o.cigar(lift_cigar + b * cigar_cap, lift_ncigar[b]);
      o.put(',');
      o.num((f & 4) ? 255 : mq);
      o.put(',');
      o.num(lift_nm[b]);
      o.cstr(";\tAA:Z:");
      int32_t na = nalt[b] < alt_cap ? nalt[b] : alt_cap;
      for (int32_t k = 0; k < na; ++k) {
        int32_t rn = alt_rname[b * alt_cap + k];
        if (rn >= 0 && rn < nseq)
          o.str(name_blob + name_off[rn],
                name_off[rn + 1] - name_off[rn] - 1);
        o.put(',');
        o.num(alt_pos[b * alt_cap + k]);
        o.put(',');
        o.num(alt_score[b * alt_cap + k]);
        o.put(';');
      }
    }
    o.put('\n');
  }
  *out_len = o.p - out;
  return o.trunc ? 1 : 0;
}

// Paired-end batch formatter: emits the interleaved (mate1, mate2)
// records of one pair batch, byte-identical to pe_records +
// write_sam_record (align/postseed.py pe_records / align/sam.py).
// Unlike the SE formatter, MAPQ/POS/PNEXT/TLEN arrive final from the
// PE runtime (monitpu_postseed_pe) and are printed verbatim; RNEXT is
// always "=" (pe_records builds every record with rnext "=").
int monitpu_format_sam_pe(
    int64_t B, int64_t M,
    const int32_t* flag, const int32_t* rname, const int64_t* pos,
    const int32_t* mapq, const int64_t* pnext, const int64_t* tlen,
    const int32_t* asc, const int32_t* zs, const int32_t* nm,
    const uint32_t* cigar, const int32_t* ncigar, const char* md,
    const int32_t* lift_rname, const int64_t* lift_pos,
    const uint32_t* lift_cigar, const int32_t* lift_ncigar,
    const int32_t* lift_nm, const uint8_t* unmapped_lft,
    const int32_t* alt_rname, const int64_t* alt_pos,
    const int32_t* alt_score, const int32_t* nalt, int32_t alt_cap,
    int32_t cigar_cap, int32_t md_cap,
    const int8_t* strand,  // [B]; -1 = never finalized
    const int8_t* m1r, const int8_t* m2r,  // [B, M] revcomp lanes
    const int32_t* len1, const int32_t* len2,
    const char* qname_blob, const int64_t* qname_off,  // [B] pair names
    const char* seq1_blob, const int64_t* seq1_off,
    const char* qual1_blob, const int64_t* qual1_off,
    const char* seq2_blob, const int64_t* seq2_off,
    const char* qual2_blob, const int64_t* qual2_off,
    const char* name_blob, const int64_t* name_off, int32_t nseq,
    char* out, int64_t out_cap, int64_t* out_len) {
  Out o{out, out + out_cap};
  auto emit = [&](int64_t b, int64_t row, bool flip, const int8_t* lane,
                  int32_t llen, const char* seqb, const int64_t* seqo,
                  const char* qualb, const int64_t* qualo) {
    int32_t f = flag[row];
    bool mapped_line = !(f & 4) || unmapped_lft[row];
    o.str(qname_blob + qname_off[b], qname_off[b + 1] - qname_off[b] - 1);
    o.put('\t');
    o.num(f);
    o.put('\t');
    if (rname[row] >= 0)
      o.str(name_blob + name_off[rname[row]],
            name_off[rname[row] + 1] - name_off[rname[row]] - 1);
    else
      o.put('*');
    o.put('\t');
    o.num(pos[row]);
    o.put('\t');
    o.num(mapq[row]);
    o.put('\t');
    if (ncigar[row] == 0)
      o.put('*');
    else
      o.cigar(cigar + row * cigar_cap, ncigar[row]);
    o.cstr("\t=\t");
    o.num(pnext[row]);
    o.put('\t');
    o.num(tlen[row]);
    o.put('\t');
    int64_t slen = seqo[b + 1] - seqo[b] - 1;
    int64_t qlen = qualo[b + 1] - qualo[b] - 1;
    if (flip) {
      for (int32_t k = 0; k < llen; ++k) o.put(DEC[lane[k]]);
      o.put('\t');
      if (qlen <= 0) {
        o.put('*');
      } else {
        const char* q = qualb + qualo[b];
        for (int64_t k = qlen - 1; k >= 0; --k) o.put(q[k]);
      }
    } else {
      if (slen <= 0)
        o.put('*');
      else
        o.str(seqb + seqo[b], slen);
      o.put('\t');
      if (qlen <= 0)
        o.put('*');
      else
        o.str(qualb + qualo[b], qlen);
    }
    if (mapped_line) {
      o.cstr("\tAS:i:");
      o.num(asc[row]);
      o.cstr("\tNM:i:");
      o.num(nm[row]);
      if (zs[row] > 0) {
        o.cstr("\tZS:i:");
        o.num(zs[row]);
      }
      o.cstr("\tMD:Z:");
      o.cstr(md + row * md_cap);
      o.cstr("\tOA:Z:");
      if (lift_rname[row] >= 0)
        o.str(name_blob + name_off[lift_rname[row]],
              name_off[lift_rname[row] + 1] - name_off[lift_rname[row]] - 1);
      else
        o.put('*');
      o.put(',');
      o.num(lift_pos[row]);
      o.put(',');
      o.put((f & 16) ? '-' : '+');
      o.put(',');
      if (lift_ncigar[row] == 0)
        o.put('*');
      else
        o.cigar(lift_cigar + row * cigar_cap, lift_ncigar[row]);
      o.put(',');
      o.num(mapq[row]);
      o.put(',');
      o.num(lift_nm[row]);
      o.cstr(";\tAA:Z:");
      int32_t na = nalt[row] < alt_cap ? nalt[row] : alt_cap;
      for (int32_t k = 0; k < na; ++k) {
        int32_t rn = alt_rname[row * alt_cap + k];
        if (rn >= 0 && rn < nseq)
          o.str(name_blob + name_off[rn],
                name_off[rn + 1] - name_off[rn] - 1);
        o.put(',');
        o.num(alt_pos[row * alt_cap + k]);
        o.put(',');
        o.num(alt_score[row * alt_cap + k]);
        o.put(';');
      }
    }
    o.put('\n');
  };
  for (int64_t b = 0; b < B; ++b) {
    int8_t st = strand[b];
    emit(b, b, st == 1, m1r + b * M, len1[b], seq1_blob, seq1_off,
         qual1_blob, qual1_off);
    emit(b, B + b, st == 0, m2r + b * M, len2[b], seq2_blob, seq2_off,
         qual2_blob, qual2_off);
  }
  *out_len = o.p - out;
  return o.trunc ? 1 : 0;
}

}  // extern "C"
