// abctok — native ABC -> tick-grid token encoder.
//
// C++ implementation of the framework's offline tokenizer hot path
// (inpaintnet_tpu/data/{abc_parser,score,tokenizer}.py): parse an ABC tune,
// expand repeats, fix pickup/last measures, transpose by a set of semitone
// shifts with correct diatonic spelling, and encode each transposition onto
// the 6-per-beat unequal tick grid (0, 1/4, 1/3, 1/2, 2/3, 3/4) with
// slur/hold tokens. Mirrors the Python implementation 1:1 (equivalence is
// enforced by tests/test_native_tokenizer.py over fixtures + synthetic
// corpora); the reference's counterpart is hours of music21 parsing
// (reference folk_data_helpers.py:351-364).
//
// Exposed via a minimal C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <numeric>
#include <set>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------- rational
struct Rat {
  long long n = 0, d = 1;
  Rat() = default;
  Rat(long long num, long long den = 1) : n(num), d(den) { norm(); }
  void norm() {
    if (d < 0) { n = -n; d = -d; }
    long long g = std::gcd(n < 0 ? -n : n, d);
    if (g > 1) { n /= g; d /= g; }
    if (n == 0) d = 1;
  }
  Rat operator+(const Rat& o) const { return Rat(n * o.d + o.n * d, d * o.d); }
  Rat operator-(const Rat& o) const { return Rat(n * o.d - o.n * d, d * o.d); }
  Rat operator*(const Rat& o) const { return Rat(n * o.n, d * o.d); }
  bool operator<(const Rat& o) const { return n * o.d < o.n * d; }
  bool operator<=(const Rat& o) const { return n * o.d <= o.n * d; }
  bool operator==(const Rat& o) const { return n == o.n && d == o.d; }
  bool operator!=(const Rat& o) const { return !(*this == o); }
  long long floor_int() const { return n >= 0 ? n / d : -((-n + d - 1) / d); }
};

// ------------------------------------------------------------------ pitch
const int kStepPc[7] = {0, 2, 4, 5, 7, 9, 11};  // C D E F G A B
const char kStepName[8] = "CDEFGAB";
// most natural generic interval per semitone 0..12 (matches Python table)
const int kSemiToGeneric[13] = {0, 1, 1, 2, 2, 3, 4, 4, 5, 5, 6, 6, 7};

struct Pitch {
  int step;   // 0..6 (C..B)
  int alter;  // chromatic alteration
  int octave; // scientific (C4 = 60)
  int midi() const { return 12 * (octave + 1) + kStepPc[step] + alter; }
  std::string name() const {
    std::string s(1, kStepName[step]);
    for (int i = 0; i < alter; ++i) s += '#';
    for (int i = 0; i < -alter; ++i) s += '-';
    return s + std::to_string(octave);
  }
  Pitch transpose(int semis) const {
    if (semis == 0) return *this;
    int sign = semis > 0 ? 1 : -1;
    int mag = semis > 0 ? semis : -semis;
    int octs = mag / 12, rem = mag % 12;
    int generic = kSemiToGeneric[rem] + 7 * octs;
    int idx = step + sign * generic;
    int new_step = ((idx % 7) + 7) % 7;
    int oct_shift = (idx - new_step) / 7;
    int new_oct = octave + oct_shift;
    int target = midi() + semis;
    int base = 12 * (new_oct + 1) + kStepPc[new_step];
    return Pitch{new_step, target - base, new_oct};
  }
};

struct NoteEv {
  Rat offset, dur;
  bool is_rest;
  Pitch pitch;  // valid iff !is_rest
};

// ------------------------------------------------------------- key parsing
int major_fifths(const std::string& tonic, bool& ok) {
  static const std::map<std::string, int> m = {
      {"C", 0},  {"G", 1},  {"D", 2},  {"A", 3},  {"E", 4},  {"B", 5},
      {"F#", 6}, {"C#", 7}, {"F", -1}, {"BB", -2}, {"EB", -3}, {"AB", -4},
      {"DB", -5}, {"GB", -6}, {"CB", -7}};
  auto it = m.find(tonic);
  ok = it != m.end();
  return ok ? it->second : 0;
}

// step (0..6) -> alter
void key_signature(const std::string& field, int alters[7]) {
  for (int i = 0; i < 7; ++i) alters[i] = 0;
  std::string s;
  for (char c : field) if (!isspace((unsigned char)c)) s += c;
  if (s.empty()) return;
  char letter = toupper(s[0]);
  if (letter < 'A' || letter > 'G') return;
  size_t i = 1;
  std::string tonic(1, letter);
  if (i < s.size() && (s[i] == '#')) { tonic += '#'; ++i; }
  else if (i < s.size() && (s[i] == 'b')) { tonic += 'B'; ++i; }
  std::string mode_raw;
  while (i < s.size() && isalpha((unsigned char)s[i])) mode_raw += tolower(s[i++]);
  int mode_adj = 0;
  std::string m3 = mode_raw.substr(0, 3);
  if (m3 == "maj" || m3 == "ion" || mode_raw.empty()) mode_adj = 0;
  else if (m3 == "mix") mode_adj = -1;
  else if (m3 == "dor") mode_adj = -2;
  else if (m3 == "min" || m3 == "aeo" || mode_raw == "m") mode_adj = -3;
  else if (m3 == "phr") mode_adj = -4;
  else if (m3 == "loc") mode_adj = -5;
  else if (m3 == "lyd") mode_adj = 1;
  else if (mode_raw[0] == 'm') mode_adj = -3;
  bool ok;
  int fifths = major_fifths(tonic, ok) + mode_adj;
  if (!ok) return;
  // sharp order F C G D A E B ; flat order B E A D G C F
  const int sharp_order[7] = {3, 0, 4, 1, 5, 2, 6};
  const int flat_order[7] = {6, 2, 5, 1, 4, 0, 3};
  if (fifths > 0)
    for (int k = 0; k < fifths && k < 7; ++k) alters[sharp_order[k]] = 1;
  else if (fifths < 0)
    for (int k = 0; k < -fifths && k < 7; ++k) alters[flat_order[k]] = -1;
}

// --------------------------------------------------------------- body parse
struct Ev { bool is_rest; Pitch p; Rat dur; };
struct Bar {
  std::vector<Ev> events;
  bool repeat_start = false, repeat_end = false, section_end = false;
  int ending = 0;
};

struct Parser {
  int key_alters[7];
  Rat unit;                   // unit note length (fraction of whole note)
  std::vector<Bar> bars{Bar{}};
  std::map<std::pair<int, int>, int> meas_acc;  // (step, octave) -> alter
  int broken = 0;
  int tuplet_remaining = 0;
  Rat tuplet_factor{1, 1};

  void new_bar(bool rep_start = false, int ending = 0) {
    Bar& last = bars.back();
    if (last.events.empty() && last.ending == 0) {
      last.repeat_start = last.repeat_start || rep_start;
      if (!last.ending) last.ending = ending;
    } else {
      Bar b;
      b.repeat_start = rep_start;
      b.ending = ending;
      bars.push_back(b);
    }
    meas_acc.clear();
  }
  void barline(const std::string& tok) {
    bool ends = tok[0] == ':';
    bool starts = tok.back() == ':';
    bool section = (tok == "||" || tok == "|]" || tok == "[|");
    bars.back().repeat_end |= ends;
    bars.back().section_end |= section;
    new_bar(starts);
  }
  void handle_ending(int num) {
    if (bars.back().events.empty()) bars.back().ending = num;
    else new_bar(false, num);
  }
  Rat length_mods(Rat dur) {
    if (tuplet_remaining > 0) { dur = dur * tuplet_factor; --tuplet_remaining; }
    if (broken > 0) {
      long long p = 1LL << broken;
      dur = dur * Rat(2 * p - 1, p);
      broken = 0;
    } else if (broken < 0) {
      long long p = 1LL << (-broken);
      dur = dur * Rat(1, p);
      broken = 0;
    }
    return dur;
  }
  void scale_prev(Rat f) {
    for (auto it = bars.rbegin(); it != bars.rend(); ++it)
      if (!it->events.empty()) { it->events.back().dur = it->events.back().dur * f; return; }
  }
  void set_broken(char c, int n) {
    long long p = 1LL << n;
    if (c == '>') { scale_prev(Rat(2 * p - 1, p)); broken = -n; }
    else { scale_prev(Rat(1, p)); broken = n; }
  }
  void add_note(int acc_kind /*0 none,1 set*/, int acc_val, int step,
                int octave, Rat dur) {
    int alter;
    if (acc_kind) {
      alter = acc_val;
      meas_acc[{step, octave}] = alter;
    } else {
      auto it = meas_acc.find({step, octave});
      alter = it != meas_acc.end() ? it->second : key_alters[step];
    }
    // durations stored in quarterLengths at parse time: L: can change
    // mid-tune, so conversion cannot be deferred to materialization
    bars.back().events.push_back(
        Ev{false, Pitch{step, alter, octave}, length_mods(dur) * unit * Rat(4)});
  }
  void add_rest(Rat dur) {
    bars.back().events.push_back(
        Ev{true, Pitch{}, length_mods(dur) * unit * Rat(4)});
  }
};

// duration token after a note, returns unit multiplier; advances i
Rat parse_dur(const std::string& b, size_t& i) {
  size_t n = b.size();
  long long num = 0;
  bool has_num = false;
  while (i < n && isdigit((unsigned char)b[i])) { num = num * 10 + (b[i] - '0'); ++i; has_num = true; }
  if (i < n && b[i] == '/') {
    size_t slashes = 0;
    while (i < n && b[i] == '/') { ++slashes; ++i; }
    long long den = 0;
    while (i < n && isdigit((unsigned char)b[i])) { den = den * 10 + (b[i] - '0'); ++i; }
    long long top = has_num ? num : 1;
    if (den > 0) return Rat(top, den);            // "3/2", "/2"
    return Rat(top, 1LL << slashes);              // "/", "//"
  }
  return has_num ? Rat(num, 1) : Rat(1, 1);
}

std::vector<Bar> expand_repeats(const std::vector<Bar>& bars) {
  std::vector<Bar> out;
  size_t repeat_start = 0, i = 0;
  int pass = 1;
  bool just_jumped = false;  // arrived at repeat_start via the jump-back?
  while (i < bars.size()) {
    const Bar& bar = bars[i];
    if (bar.repeat_start && !just_jumped) {
      // a new |: ALWAYS starts a fresh section on pass 1 — reaching it
      // with pass still 2 happens when the previous section's second
      // ending finished on a plain barline (no :| or |]); without the
      // reset this section's [1 ending is skipped and its repeat is
      // never taken (mirrors abc_parser.py _expand_repeats)
      repeat_start = i;
      pass = 1;
    }
    just_jumped = false;
    if (bar.ending && bar.ending != pass) {
      while (i < bars.size()) {
        if (bars[i].repeat_end || bars[i].section_end) { ++i; break; }
        ++i;
      }
      continue;
    }
    out.push_back(bar);
    if (bar.repeat_end) {
      if (pass == 1) { i = repeat_start; pass = 2; just_jumped = true; continue; }
      pass = 1; ++i; repeat_start = i; continue;
    }
    if (bar.section_end) { pass = 1; repeat_start = i + 1; }
    ++i;
  }
  return out;
}

struct Tune {
  std::vector<NoteEv> notes;
  std::vector<Rat> bar_durs;
  int ts_num = 4, ts_den = 4;
  bool ok = false;
  std::string error;
};

bool parse_ts(const std::string& v, int& num, int& den) {
  std::string s;
  for (char c : v) if (!isspace((unsigned char)c)) s += c;
  if (s == "C" || s == "common") { num = 4; den = 4; return true; }
  if (s == "C|" || s == "cut") { num = 2; den = 2; return true; }
  size_t slash = s.find('/');
  if (slash == std::string::npos) return false;
  try {
    num = std::stoi(s.substr(0, slash));
    den = std::stoi(s.substr(slash + 1));
  } catch (...) { return false; }
  return num > 0 && den > 0;
}

Tune parse_abc(const std::string& text, bool expand) {
  Tune tune;
  std::map<char, std::string> headers;
  std::vector<std::string> body_lines;
  bool in_body = false;
  std::istringstream iss(text);
  std::string raw;
  while (std::getline(iss, raw)) {
    size_t pct = raw.find('%');
    std::string line = pct == std::string::npos ? raw : raw.substr(0, pct);
    while (!line.empty() && isspace((unsigned char)line.back())) line.pop_back();
    if (line.empty()) continue;
    bool is_field = line.size() >= 2 && isalpha((unsigned char)line[0]) && line[1] == ':';
    // a MUSIC line like 'E:| ...' — one note completing a bar at line
    // start before a repeat-end — is body content, not an info field
    // (mirrors abc_parser.py parse_abc's in-body heuristic)
    if (is_field && in_body && line[0] != 'w' && line[0] != 'W') {
      size_t st = line.find_first_not_of(" \t\v\f\r\n", 2);
      if (st != std::string::npos && line[st] == '|') is_field = false;
    }
    if (is_field &&
        (!in_body || std::string("KLMV").find(line[0]) != std::string::npos)) {
      char key = line[0];
      std::string val = line.substr(2);
      size_t st = val.find_first_not_of(" \t");
      val = st == std::string::npos ? "" : val.substr(st);
      if (key == 'w') continue;
      if (in_body) {
        // mid-tune K:/M:/L: change state forward (inline markers); header
        // values stay first-wins so the score-level time signature is the
        // opening one. V: markers are ignored (multi-voice tunes are
        // dropped by the validity filter).
        if (key == 'M' || key == 'L' || key == 'K') {
          if (!body_lines.empty())
            body_lines.push_back("[" + std::string(1, key) + ":" + val + "]");
          else
            headers[key] = val;  // field between K: and the first music line
        }
        continue;
      }
      headers[key] = val;
      if (key == 'K') in_body = true;
      continue;
    }
    if (in_body && is_field)
      continue;  // other info lines (W: lyrics etc.) are not note content
    if (in_body) body_lines.push_back(line);
  }
  if (!headers.count('K')) { tune.error = "missing K header"; return tune; }
  if (!parse_ts(headers.count('M') ? headers['M'] : "4/4", tune.ts_num, tune.ts_den)) {
    tune.error = "bad time signature"; return tune;
  }
  Parser P;
  if (headers.count('L')) {
    std::string l = headers['L'];
    size_t slash = l.find('/');
    if (slash == std::string::npos) { tune.error = "bad L"; return tune; }
    try { P.unit = Rat(std::stoll(l.substr(0, slash)), std::stoll(l.substr(slash + 1))); }
    catch (...) { tune.error = "bad L"; return tune; }
  } else {
    P.unit = (Rat(tune.ts_num, tune.ts_den) < Rat(3, 4)) ? Rat(1, 16) : Rat(1, 8);
  }
  key_signature(headers['K'], P.key_alters);
  bool compound = (tune.ts_num == 6 || tune.ts_num == 9 || tune.ts_num == 12) && tune.ts_den == 8;
  // score-level signature stays the opening one; inline [M:] changes only
  // affect subsequent full-bar rests
  int cur_ts_num = tune.ts_num, cur_ts_den = tune.ts_den;

  std::string b;
  for (auto& l : body_lines) { b += l; b += ' '; }
  size_t i = 0, n = b.size();
  auto step_of = [](char c) { return (toupper(c) - 'C' + 7) % 7; };
  while (i < n) {
    char c = b[i];
    if (c == ' ' || c == '\t' || c == '\\') { ++i; continue; }
    if (c == '[') {
      // inline field?
      if (i + 2 < n && isalpha((unsigned char)b[i + 1]) && b[i + 2] == ':') {
        size_t close = b.find(']', i);
        if (close != std::string::npos) {
          char k = b[i + 1];
          std::string v = b.substr(i + 3, close - i - 3);
          if (k == 'K') key_signature(v, P.key_alters);
          else if (k == 'M') parse_ts(v, cur_ts_num, cur_ts_den);
          else if (k == 'L') {
            size_t slash = v.find('/');
            if (slash != std::string::npos)
              P.unit = Rat(std::stoll(v.substr(0, slash)), std::stoll(v.substr(slash + 1)));
          }
          i = close + 1;
          continue;
        }
      }
      if (i + 1 < n && (b[i + 1] == '1' || b[i + 1] == '2')) {
        P.handle_ending(b[i + 1] - '0');
        i += 2;
        continue;
      }
      tune.error = "unsupported [ construct (chord?)";
      return tune;
    }
    if (c == ':' || c == '|') {
      if (c == '|' && i + 1 < n && (b[i + 1] == '1' || b[i + 1] == '2')) {
        P.barline("|");
        P.handle_ending(b[i + 1] - '0');
        i += 2;
        continue;
      }
      // longest barline token
      static const char* toks[] = {"::", ":|]", ":|", "||:", "||", "[|", "|]", "|:", "|"};
      bool matched = false;
      for (const char* t : toks) {
        size_t len = strlen(t);
        if (b.compare(i, len, t) == 0) { P.barline(t); i += len; matched = true; break; }
      }
      if (!matched) ++i;
      continue;
    }
    if (c == '(') {
      if (i + 1 < n && isdigit((unsigned char)b[i + 1])) {
        int p = b[i + 1] - '0';
        i += 2;
        int q = -1, r = -1;
        if (i < n && b[i] == ':') {
          ++i;
          if (i < n && isdigit((unsigned char)b[i])) { q = b[i] - '0'; ++i; }
          if (i < n && b[i] == ':') {
            ++i;
            if (i < n && isdigit((unsigned char)b[i])) { r = b[i] - '0'; ++i; }
          }
        }
        if (q < 0) {
          switch (p) {
            case 2: q = 3; break;
            case 3: q = 2; break;
            case 4: q = 3; break;
            case 6: q = 2; break;
            case 8: q = 3; break;
            default: q = compound ? 3 : 2;
          }
        }
        P.tuplet_factor = Rat(q, p);
        P.tuplet_remaining = r > 0 ? r : p;
        continue;
      }
      ++i;
      continue;
    }
    if (c == ')') { ++i; continue; }
    if (c == '<' || c == '>') {
      size_t j = i;
      while (j < n && b[j] == c) ++j;
      P.set_broken(c, (int)(j - i));
      i = j;
      continue;
    }
    if (c == '{') {
      size_t close = b.find('}', i);
      i = close == std::string::npos ? n : close + 1;
      continue;
    }
    if (c == '!') {
      size_t close = b.find('!', i + 1);
      i = close == std::string::npos ? i + 1 : close + 1;
      continue;
    }
    if (strchr("~.HLMOPSTuv", c)) { ++i; continue; }
    if (c == 'z' || c == 'x') {
      ++i;
      P.add_rest(parse_dur(b, i));
      continue;
    }
    if (c == 'Z') {
      ++i;
      long long count = 0;
      while (i < n && isdigit((unsigned char)b[i])) { count = count * 10 + (b[i] - '0'); ++i; }
      if (count == 0) count = 1;
      Rat bar_ql = Rat(cur_ts_num * 4, cur_ts_den);
      for (long long k = 0; k < count; ++k) {
        P.bars.back().events.push_back(Ev{true, Pitch{}, bar_ql});
        P.barline("|");
      }
      continue;
    }
    if (c == '^' || c == '_' || c == '=') {
      int val = 0;
      if (c == '^') { val = 1; if (i + 1 < n && b[i + 1] == '^') { val = 2; ++i; } }
      else if (c == '_') { val = -1; if (i + 1 < n && b[i + 1] == '_') { val = -2; ++i; } }
      ++i;
      if (i >= n || !isalpha((unsigned char)b[i]) || toupper(b[i]) < 'A' || toupper(b[i]) > 'G') {
        continue;  // stray accidental
      }
      char sc = b[i];
      int step = step_of(sc);
      int octave = isupper((unsigned char)sc) ? 4 : 5;
      ++i;
      while (i < n && (b[i] == '\'' || b[i] == ',')) { octave += b[i] == '\'' ? 1 : -1; ++i; }
      Rat dur = parse_dur(b, i);
      if (i < n && b[i] == '-') ++i;  // tie: notes stay separate
      P.add_note(1, val, step, octave, dur);
      continue;
    }
    if (isalpha((unsigned char)c) && toupper(c) >= 'A' && toupper(c) <= 'G') {
      int step = step_of(c);
      int octave = isupper((unsigned char)c) ? 4 : 5;
      ++i;
      while (i < n && (b[i] == '\'' || b[i] == ',')) { octave += b[i] == '\'' ? 1 : -1; ++i; }
      Rat dur = parse_dur(b, i);
      if (i < n && b[i] == '-') ++i;
      P.add_note(0, 0, step, octave, dur);
      continue;
    }
    if (c == '"') { tune.error = "chord symbols unsupported"; return tune; }
    ++i;  // unknown char: skip
  }

  std::vector<Bar> bars;
  for (auto& bar : P.bars)
    if (!bar.events.empty()) bars.push_back(bar);
  if (expand) bars = expand_repeats(bars);

  Rat offset(0);
  for (auto& bar : bars) {
    Rat bar_start = offset;
    for (auto& ev : bar.events) {
      Rat d = ev.dur;  // already quarterLengths
      if (d.n <= 0) { tune.error = "zero or negative note duration"; tune.ok = false; return tune; }
      tune.notes.push_back(NoteEv{offset, d, ev.is_rest, ev.p});
      offset = offset + d;
    }
    tune.bar_durs.push_back(offset - bar_start);
  }
  tune.ok = true;
  return tune;
}

// ------------------------------------------------- pickup / last-bar fixes
void fix_pickup(Tune& t) {
  if (t.notes.empty() || t.bar_durs.empty()) return;
  Rat bar(t.ts_num * 4, t.ts_den);
  Rat m0 = t.bar_durs[0];
  Rat m1 = t.bar_durs.size() > 1 ? t.bar_durs[1] : Rat(0);
  if (bar <= m0) return;
  if (m0 + m1 == bar) return;
  Rat pad = bar - m0;
  for (auto& nv : t.notes) nv.offset = nv.offset + pad;
  t.notes.insert(t.notes.begin(), NoteEv{Rat(0), pad, true, Pitch{}});
  t.bar_durs[0] = bar;
}

void fix_last(Tune& t) {
  if (t.notes.empty()) return;
  Rat bar(t.ts_num * 4, t.ts_den);
  Rat end(0);
  for (auto& nv : t.notes) {
    Rat e = nv.offset + nv.dur;
    if (end < e) end = e;
  }
  // rem = end mod bar
  Rat q = Rat(end.n * bar.d, end.d * bar.n);
  long long fl = q.floor_int();
  Rat rem = end - bar * Rat(fl);
  if (rem.n == 0) return;
  t.notes.push_back(NoteEv{end, bar - rem, true, Pitch{}});
  if (!t.bar_durs.empty()) t.bar_durs.back() = t.bar_durs.back() + (bar - rem);
}

// ------------------------------------------------------------- tick encode
const Rat kTickVals[6] = {Rat(0), Rat(1, 4), Rat(1, 3), Rat(1, 2), Rat(2, 3), Rat(3, 4)};
const Rat kTickDurs[6] = {Rat(1, 4), Rat(1, 12), Rat(1, 6), Rat(1, 6), Rat(1, 12), Rat(1, 4)};

bool on_ticks(const Tune& t) {
  for (auto& nv : t.notes) {
    long long fl = nv.offset.floor_int();
    Rat frac = nv.offset - Rat(fl);
    bool hit = false;
    for (auto& tv : kTickVals)
      if (frac == tv) { hit = true; break; }
    if (!hit) return false;
  }
  return true;
}

// token name for a (possibly transposed) event with pitch-range clamping
std::string token_name(const NoteEv& nv, int lo, int hi) {
  if (nv.is_rest) return "rest";
  int m = nv.pitch.midi();
  if (m < lo || m > hi) return "OOR";
  return nv.pitch.name();
}

// vocab lookup with enharmonic fallback (mirrors Python
// tokenizer._lookup_token): exact spelling, then enharmonic respellings of
// the same midi pitch nearest-first, then OOR.
bool lookup_token(const std::unordered_map<std::string, int>& vocab,
                  const NoteEv& nv, int lo, int hi, int32_t& out_id) {
  std::string tok = token_name(nv, lo, hi);
  auto it = vocab.find(tok);
  if (it != vocab.end()) { out_id = it->second; return true; }
  if (!nv.is_rest) {
    int midi = nv.pitch.midi();
    for (int abs_alter = 0; abs_alter <= 2; ++abs_alter) {
      for (int step = 0; step < 7; ++step) {
        for (int oct = nv.pitch.octave - 1; oct <= nv.pitch.octave + 1; ++oct) {
          int alter = midi - (12 * (oct + 1) + kStepPc[step]);
          if (alter != abs_alter && alter != -abs_alter) continue;
          auto it2 = vocab.find(Pitch{step, alter, oct}.name());
          if (it2 != vocab.end()) { out_id = it2->second; return true; }
        }
      }
    }
  }
  auto oor = vocab.find("OOR");
  if (oor != vocab.end()) { out_id = oor->second; return true; }
  return false;
}

// exact port of the Python/reference tick walk
bool encode_ticks(const std::vector<NoteEv>& notes, Rat highest,
                  const std::unordered_map<std::string, int>& vocab,
                  int lo, int hi, std::vector<int32_t>& out,
                  std::string& err) {
  auto slur_it = vocab.find("__");
  if (slur_it == vocab.end()) { err = "vocab missing slur"; return false; }
  int slur = slur_it->second;
  long long length = (highest * Rat(6)).floor_int();
  out.resize(length);
  size_t j = 0;
  size_t num_notes = notes.size();
  Rat cur(0);
  bool artic = true;
  long long i = 0;
  while (i < length) {
    if (j + 1 < num_notes && notes[j + 1].offset <= cur) {
      ++j;
      artic = true;
      continue;
    }
    if (artic) {
      int32_t tid;
      if (!lookup_token(vocab, notes[j], lo, hi, tid)) {
        err = "unknown token " + token_name(notes[j], lo, hi);
        return false;
      }
      out[i] = tid;
    } else {
      out[i] = slur;
    }
    ++i;
    cur = cur + kTickDurs[(i - 1) % 6];
    artic = false;
  }
  return true;
}

thread_local std::string g_err;

}  // namespace

extern "C" {

// Parse + fix a tune; returns 0 on success. info = [ts_num, ts_den,
// num_notes, min_pitch, max_pitch, total_ticks, on_grid(0/1)].
int abctok_info(const char* text, int32_t* info) {
  Tune t = parse_abc(text, /*expand=*/true);
  if (!t.ok) { g_err = t.error; return 1; }
  fix_pickup(t);
  fix_last(t);
  int mn = 1 << 20, mx = -1, cnt = 0;
  Rat highest(0);
  for (auto& nv : t.notes) {
    Rat e = nv.offset + nv.dur;
    if (highest < e) highest = e;
    if (!nv.is_rest) {
      int m = nv.pitch.midi();
      mn = std::min(mn, m);
      mx = std::max(mx, m);
      ++cnt;
    }
  }
  info[0] = t.ts_num;
  info[1] = t.ts_den;
  info[2] = cnt;
  info[3] = cnt ? mn : -1;
  info[4] = cnt ? mx : -1;
  info[5] = (int32_t)(highest * Rat(6)).floor_int();
  info[6] = on_ticks(t) ? 1 : 0;
  return 0;
}

// Emit the newline-joined token names of all notes over the given
// transpositions (vocabulary-building scan). Returns bytes written or -1.
int abctok_scan(const char* text, const int32_t* semis, int n_semis,
                int lo, int hi, char* out, int cap) {
  Tune t = parse_abc(text, true);
  if (!t.ok) { g_err = t.error; return -1; }
  fix_pickup(t);
  fix_last(t);
  std::string buf;
  for (int s = 0; s < n_semis; ++s) {
    for (auto& nv : t.notes) {
      NoteEv tr = nv;
      if (!tr.is_rest) tr.pitch = tr.pitch.transpose(semis[s]);
      buf += token_name(tr, lo, hi);
      buf += '\n';
    }
  }
  if ((int)buf.size() + 1 > cap) { g_err = "scan buffer too small"; return -1; }
  memcpy(out, buf.data(), buf.size());
  out[buf.size()] = 0;
  return (int)buf.size();
}

// Encode the tune at each transposition. vocab is a newline-joined token
// list (index = position). out is [n_semis, max_len] int32 (row-major);
// lens[s] receives each row's true length (or -1 on failure).
// Returns 0 if parsing succeeded.
int abctok_encode(const char* text, const int32_t* semis, int n_semis,
                  const char* vocab_joined, int lo, int hi,
                  int32_t* out, int32_t* lens, int max_len) {
  Tune t = parse_abc(text, true);
  if (!t.ok) { g_err = t.error; return 1; }
  fix_pickup(t);
  fix_last(t);
  if (!on_ticks(t)) { g_err = "notes off tick grid"; return 2; }
  std::unordered_map<std::string, int> vocab;
  {
    std::istringstream vs(vocab_joined);
    std::string tok;
    int idx = 0;
    while (std::getline(vs, tok)) vocab.emplace(tok, idx++);
  }
  Rat highest(0);
  for (auto& nv : t.notes) {
    Rat e = nv.offset + nv.dur;
    if (highest < e) highest = e;
  }
  for (int s = 0; s < n_semis; ++s) {
    std::vector<NoteEv> notes = t.notes;
    if (semis[s] != 0)
      for (auto& nv : notes)
        if (!nv.is_rest) nv.pitch = nv.pitch.transpose(semis[s]);
    std::vector<int32_t> row;
    std::string err;
    if (!encode_ticks(notes, highest, vocab, lo, hi, row, err)) {
      lens[s] = -1;
      continue;
    }
    int copy_len = std::min((int)row.size(), max_len);
    memcpy(out + (size_t)s * max_len, row.data(), sizeof(int32_t) * copy_len);
    lens[s] = copy_len;
  }
  return 0;
}

const char* abctok_last_error() { return g_err.c_str(); }

}  // extern "C"
