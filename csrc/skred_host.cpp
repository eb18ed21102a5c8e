// skred_host — native timeline compiler.
//
// C++ implementation of the host control plane: the skode streaming parser
// (reference: skode.c), the wire dispatch (wire.c:591-867), the voice-
// control engine model (synth.c setters) and the sequencer/defer-queue
// simulation (seq.c:164-213) that compiles wire scripts into per-segment
// parameter tensors for the TPU renderer.
//
// The Python implementation (skred_tpu/host/*.py) is the semantic oracle;
// this library must produce bit-identical compile output (enforced by
// tests/test_native.py across the bundled script corpus).  Build with
// -ffp-contract=off: the Python host does strict per-op f32 rounding.
//
// Exposed C ABI (ctypes): skc_compile() / skc_free().

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

namespace {

constexpr int SAMPLE_RATE = 44100;
constexpr int VOICE_MAX = 64;
constexpr int PATTERNS_MAX = 16;
constexpr int SEQ_STEPS_MAX = 256;
constexpr int QUEUE_SIZE = 1024;
constexpr int WAVE_TABLE_MAX = 1200;
constexpr float AMY_FACTOR = 0.025f;
constexpr float SMOOTH_DEFAULT = 0.02f;

// C (int) cast semantics incl. the NaN/out-of-range INT_MIN quirk
static int c_int(double d) {
  if (std::isnan(d) || std::isinf(d)) return INT32_MIN;
  if (d >= 2147483648.0 || d < -2147483648.0) return INT32_MIN;
  return (int)d;
}

// ---------------- slot metadata (bank mirror) ----------------
struct Slot {
  int valid = 0;
  int size = 0;
  float rate = 0.f;
  int one_shot = 0, loop_enabled = 0, loop_start = 0, loop_end = 0;
  float midi_note = 0.f, offset_hz = 0.f;
  int table_gen = -1;   // identity of the bound data (index into table registry)
};

// a ':w' load performed during compilation — Python replays it on the bank
struct LoadEvent { int which, where, ch, gen; };

// ---------------- engine state ----------------
struct Env {
  float a = 0, d = 0, s = 1, r = 0;
  float attack = 0, decay = 0, sustain = 1, release = 0;
  int64_t start = 0, rel_at = 0;
  int active = 0;
  float velocity = 0;
};

struct Ops {
  uint8_t set_phase[VOICE_MAX] = {};
  float phase[VOICE_MAX] = {};
  uint8_t set_finished[VOICE_MAX] = {};
  int32_t finished[VOICE_MAX] = {};
  uint8_t set_sample[VOICE_MAX] = {};
  float sample[VOICE_MAX] = {};
  uint8_t clear_filter[VOICE_MAX] = {};
  uint8_t set_smoother[VOICE_MAX] = {};
  float smoother[VOICE_MAX] = {};
  uint8_t set_pan[VOICE_MAX] = {};
  float pan_left[VOICE_MAX] = {};
  float pan_right[VOICE_MAX] = {};
  int32_t copy_hold_from[VOICE_MAX];
  Ops() { for (auto &v : copy_hold_from) v = -1; }
  void clear() { *this = Ops(); }
};

struct Engine {
  // voice params (synth.def analog)
  float phase_inc[VOICE_MAX] = {};
  int32_t table_index[VOICE_MAX] = {};
  int32_t table_size[VOICE_MAX] = {};
  float table_rate[VOICE_MAX] = {};
  int32_t one_shot[VOICE_MAX] = {};
  int32_t loop_enabled[VOICE_MAX] = {};
  int32_t loop_start[VOICE_MAX] = {}, loop_end[VOICE_MAX] = {};
  float loop_start_f[VOICE_MAX] = {}, loop_end_f[VOICE_MAX] = {};
  int32_t loop_valid[VOICE_MAX] = {};
  float midi_note[VOICE_MAX] = {}, midi_transpose[VOICE_MAX] = {};
  float link_midi_a[VOICE_MAX] = {}, link_midi_b[VOICE_MAX] = {};
  float link_velo_a[VOICE_MAX] = {}, link_velo_b[VOICE_MAX] = {};
  float link_trig[VOICE_MAX] = {};
  float offset_hz[VOICE_MAX] = {};
  float freq[VOICE_MAX] = {}, note[VOICE_MAX] = {};
  int32_t hold_max[VOICE_MAX] = {};
  float amp[VOICE_MAX] = {}, user_amp[VOICE_MAX] = {};
  float pan[VOICE_MAX] = {}, pan_left[VOICE_MAX] = {}, pan_right[VOICE_MAX] = {};
  int32_t use_amp_envelope[VOICE_MAX] = {};
  int32_t freq_mod_osc[VOICE_MAX] = {};
  float freq_mod_depth[VOICE_MAX] = {}, freq_scale[VOICE_MAX] = {};
  int32_t pan_mod_osc[VOICE_MAX] = {}, amp_mod_osc[VOICE_MAX] = {},
          cz_mod_osc[VOICE_MAX] = {};
  float pan_mod_depth[VOICE_MAX] = {}, amp_mod_depth[VOICE_MAX] = {},
        cz_mod_depth[VOICE_MAX] = {};
  int32_t disconnect[VOICE_MAX] = {}, quantize[VOICE_MAX] = {},
          direction[VOICE_MAX] = {}, record[VOICE_MAX] = {};
  int32_t cz_mode[VOICE_MAX] = {};
  float cz_distortion[VOICE_MAX] = {};
  int32_t smoother_enable[VOICE_MAX] = {};
  float smoother_smoothing[VOICE_MAX] = {};
  int32_t gliss_enable[VOICE_MAX] = {};
  float gliss_speed[VOICE_MAX] = {}, gliss_target[VOICE_MAX] = {};
  float filter_freq[VOICE_MAX] = {}, filter_res[VOICE_MAX] = {};
  int32_t filter_mode[VOICE_MAX] = {};
  float b0[VOICE_MAX] = {}, b1[VOICE_MAX] = {}, b2[VOICE_MAX] = {},
        a1[VOICE_MAX] = {}, a2[VOICE_MAX] = {};
  float flt_last_freq[VOICE_MAX] = {}, flt_last_res[VOICE_MAX] = {};
  int32_t flt_last_mode[VOICE_MAX] = {};
  Env env[VOICE_MAX];
  int32_t table_key[VOICE_MAX] = {};

  // globals
  float volume_user = 1.0f, volume_final = AMY_FACTOR;
  int64_t sample_count = 0;
  float tempo_time_per_step = 60.0f, tempo_bpm = 30.0f, tempo_base = 0.0f;
  bool unsupported = false;   // recorder / dynamic wave expansion used:
                              // the Python compiler is the full path
                              // (scripts touching them are refused, so
                              // no rec_state lives here)

  // sequencer
  std::string seq_pattern[PATTERNS_MAX][SEQ_STEPS_MAX];
  int32_t seq_mute[PATTERNS_MAX][SEQ_STEPS_MAX] = {};
  int32_t seq_pointer[PATTERNS_MAX] = {}, seq_counter[PATTERNS_MAX] = {},
          seq_state[PATTERNS_MAX] = {};
  int32_t seq_modulo[PATTERNS_MAX];
  double seq_clock_sec = 0.0;

  // defer queue
  int32_t queue_state[QUEUE_SIZE] = {};
  uint64_t queue_when[QUEUE_SIZE] = {};
  std::string queue_what[QUEUE_SIZE];
  int32_t queue_voice[QUEUE_SIZE] = {};

  double global_var[10] = {};

  Slot slots[WAVE_TABLE_MAX];
  std::vector<LoadEvent> loads;
  int next_gen = 0;
  std::string script_dir;
  // table keys are assigned in first-bind order (matches the Python
  // engine's table_list identity registry)
  std::vector<int32_t> bind_gens;           // key -> generation

  Ops ops;
  bool dirty = true;

  Engine() { for (auto &m : seq_modulo) m = 4; }

  bool valid_voice(int v) const { return v >= 0 && v < VOICE_MAX; }

  float osc_get_phase_inc(int v, float f) {
    float g = f;
    if (one_shot[v]) g /= offset_hz[v];
    return (g * (float)table_size[v]) / table_rate[v]
           * (table_rate[v] / (float)SAMPLE_RATE);
  }
  void osc_set_freq(int v, float f) { phase_inc[v] = osc_get_phase_inc(v, f); dirty = true; }

  void osc_set_wave_table_index(int v, int wave) {
    Slot &s = slots[wave];
    if (!s.valid) return;
    int key = -1;
    for (size_t i = 0; i < bind_gens.size(); i++)
      if (bind_gens[i] == s.table_gen) { key = (int)i; break; }
    if (key < 0) { key = (int)bind_gens.size(); bind_gens.push_back(s.table_gen); }
    table_key[v] = key;
    table_index[v] = wave;
    ops.set_finished[v] = 1;
    ops.finished[v] = s.one_shot ? 1 : 0;
    bool update = table_rate[v] != s.rate || table_size[v] != s.size;
    table_rate[v] = s.rate;
    table_size[v] = s.size;
    one_shot[v] = s.one_shot;
    loop_start[v] = s.loop_start;
    loop_enabled[v] = s.loop_enabled;
    loop_end[v] = s.loop_end;
    midi_note[v] = s.midi_note;
    offset_hz[v] = s.offset_hz;
    loop_start_f[v] = (float)s.loop_start;
    loop_end_f[v] = (float)s.loop_end;
    loop_valid[v] = s.loop_end > s.loop_start ? 1 : 0;
    if (update) osc_set_freq(v, freq[v]);
    dirty = true;
  }

  void osc_trigger(int v) {
    ops.set_finished[v] = 1;
    ops.finished[v] = 0;
    float ph;
    if (one_shot[v]) {
      ph = direction[v] ? (float)(table_size[v] - 1) : 0.0f;
    } else if (direction[v]) {
      ph = loop_enabled[v] ? (float)loop_end[v] - 1e-6f
                           : (float)(table_size[v] - 1);
    } else {
      ph = loop_enabled[v] ? (float)loop_start[v] : 0.0f;
    }
    ops.set_phase[v] = 1;
    ops.phase[v] = ph;
    dirty = true;
  }

  void mmf_set_params(int n, float f, float res) {
    if (f == flt_last_freq[n] && res == flt_last_res[n]
        && filter_mode[n] == flt_last_mode[n]) return;
    flt_last_freq[n] = f;
    flt_last_res[n] = res;
    flt_last_mode[n] = filter_mode[n];
    float omega = 2.0f * (float)M_PI * f / (float)SAMPLE_RATE;
    float so = sinf(omega), co = cosf(omega);
    float alpha = so / (2.0f * res);
    float B0, B1, B2, A0, A1, A2;
    switch (filter_mode[n]) {
      case 0: return;
      case 2: B0 = (1.0f + co) / 2.0f; B1 = -(1.0f + co); B2 = (1.0f + co) / 2.0f; break;
      case 3: B0 = alpha; B1 = 0.0f; B2 = -alpha; break;
      case 4: B0 = 1.0f; B1 = -2.0f * co; B2 = 1.0f; break;
      case 5: B0 = 1.0f - alpha; B1 = -2.0f * co; B2 = 1.0f + alpha; break;
      default: B0 = (1.0f - co) / 2.0f; B1 = 1.0f - co; B2 = (1.0f - co) / 2.0f; break;
    }
    A0 = 1.0f + alpha; A1 = -2.0f * co; A2 = 1.0f - alpha;
    b0[n] = B0 / A0; b1[n] = B1 / A0; b2[n] = B2 / A0;
    a1[n] = A1 / A0; a2[n] = A2 / A0;
    filter_freq[n] = f; filter_res[n] = res;
    dirty = true;
  }

  void mmf_init(int n, float f, float res) {
    ops.clear_filter[n] = 1;
    flt_last_freq[n] = -1.0f; flt_last_res[n] = -1.0f; flt_last_mode[n] = -1;
    filter_freq[n] = f; filter_res[n] = res;
    mmf_set_params(n, f, res);
    dirty = true;
  }

  void envelope_init(int v, float a, float d, float s, float r) {
    env[v].a = a; env[v].d = d; env[v].s = s; env[v].r = r;
    env[v].attack = a * (float)SAMPLE_RATE;
    env[v].decay = d * (float)SAMPLE_RATE;
    env[v].sustain = fmaxf(0.f, fminf(1.0f, s));
    env[v].release = r * (float)SAMPLE_RATE;
    env[v].start = 0; env[v].rel_at = 0; env[v].active = 0;
    dirty = true;
  }

  bool env_device_active(int v) {
    if (!env[v].active) return false;
    if (env[v].rel_at == 0) return true;
    double rt = env[v].release;
    int64_t k = (int64_t)ceil(rt);
    while ((float)k < (float)rt) k++;
    return sample_count - env[v].rel_at < k;
  }

  void envelope_velocity(int v, double f) {
    if (!valid_voice(v)) return;
    if (f == 0) {
      if (env_device_active(v)) env[v].rel_at = sample_count;
      else if (env[v].active) env[v].active = 0;
    } else {
      use_amp_envelope[v] = 1;
      if (one_shot[v]) osc_trigger(v);
      env[v].start = sample_count;
      env[v].rel_at = 0;
      env[v].velocity = (float)f;
      env[v].active = 1;
    }
    dirty = true;
  }

  float midi2hz(float f) { return 440.0f * powf(2.0f, (f - 69.0f) / 12.0f); }

  void amp_set(int v, double f) {
    if (f >= 0) {
      use_amp_envelope[v] = 0;
      amp[v] = (float)f;
      user_amp[v] = (float)f;
      dirty = true;
    }
  }
  void pan_set(int v, double f) {
    if (f >= -1.0 && f <= 1.0) {
      pan[v] = (float)f;
      pan_left[v] = (1.0f - (float)f) / 2.0f;
      pan_right[v] = (1.0f + (float)f) / 2.0f;
      ops.set_pan[v] = 1;
      ops.pan_left[v] = pan_left[v];
      ops.pan_right[v] = pan_right[v];
      dirty = true;
    }
  }
  void freq_set(int v, double f) {
    if (f >= 0 && f < (double)SAMPLE_RATE) {
      freq[v] = (float)f;
      osc_set_freq(v, (float)f);
    }
  }
  void freq_midi(int v, double f) {
    if (f >= 0.0 && f <= 127.0) {
      float ff = (float)f;
      if (midi_transpose[v]) ff += midi_transpose[v];
      freq_set(v, midi2hz(ff));
    }
  }
  void wave_set(int v, int wave) {
    if (wave >= 0 && wave < WAVE_TABLE_MAX) osc_set_wave_table_index(v, wave);
  }
  void wave_mute(int v, int state) {
    if (state < 0) state = disconnect[v] == 0 ? 1 : 0;
    disconnect[v] = state; dirty = true;
  }
  void wave_dir(int v, int state) {
    if (state < 0) state = direction[v] == 0 ? 1 : 0;
    direction[v] = state; dirty = true;
  }
  void wave_loop(int v, int state) {
    if (state < 0) state = loop_enabled[v] == 0 ? 1 : 0;
    loop_enabled[v] = state; dirty = true;
  }
  void freq_mod_set(int v, int o, double f) {
    if (!valid_voice(v) || !valid_voice(o)) return;
    freq_mod_osc[v] = o;
    freq_mod_depth[v] = (float)f;
    freq_scale[v] = (float)table_size[v] / (float)table_size[o];
    dirty = true;
  }
  void amp_mod_set(int v, int o, double f) {
    if (!valid_voice(v) || !valid_voice(o)) return;
    amp_mod_osc[v] = o; amp_mod_depth[v] = (float)f; dirty = true;
  }
  void pan_mod_set(int v, int o, double f) {
    if (!valid_voice(v) || !valid_voice(o)) return;
    pan_mod_osc[v] = o; pan_mod_depth[v] = (float)f; dirty = true;
  }
  void cz_set(int v, int n, double f) {
    cz_mode[v] = n; cz_distortion[v] = (float)f; dirty = true;
  }
  void cmod_set(int v, int o, double f) {
    cz_mod_osc[v] = o; cz_mod_depth[v] = (float)f; dirty = true;
  }
  void wave_default(int v) {
    float g = midi2hz(midi_note[v]);
    freq[v] = g;
    note[v] = midi_note[v];
    osc_set_freq(v, g);
  }

  void voice_reset(int i) {
    table_index[i] = 0; table_rate[i] = 0; table_size[i] = 0;
    ops.set_sample[i] = 1; ops.sample[i] = 0;
    amp[i] = 0; user_amp[i] = 0; pan[i] = 0;
    pan_left[i] = 0.5f; pan_right[i] = 0.5f;
    ops.set_pan[i] = 1; ops.pan_left[i] = 0.5f; ops.pan_right[i] = 0.5f;
    use_amp_envelope[i] = 0;
    amp_mod_osc[i] = -1; freq_mod_osc[i] = -1;
    freq_mod_depth[i] = 0; freq_scale[i] = 1.0f;
    pan_mod_osc[i] = -1;
    disconnect[i] = 0; quantize[i] = 0; direction[i] = 0;
    envelope_init(i, 0, 0, 1, 0);
    freq[i] = 440.0f; midi_note[i] = 69.0f; midi_transpose[i] = 0;
    link_midi_a[i] = -1; link_midi_b[i] = -1;
    link_velo_a[i] = -1; link_velo_b[i] = -1; link_trig[i] = -1;
    osc_set_wave_table_index(i, 0);
    filter_mode[i] = 0;
    mmf_init(i, 8000.0f, 0.707f);
    smoother_enable[i] = 1;
    ops.set_smoother[i] = 1; ops.smoother[i] = 0;
    smoother_smoothing[i] = SMOOTH_DEFAULT;
    gliss_enable[i] = 0; gliss_speed[i] = 0; gliss_target[i] = freq[i];
    record[i] = 0;
    dirty = true;
  }
  void voice_init() { for (int i = 0; i < VOICE_MAX; i++) voice_reset(i); }
  void wave_reset(int /*voice*/, int n) {
    if (!valid_voice(n)) voice_init(); else voice_reset(n);
  }
  void voice_copy(int v, int n) {
    wave_set(n, table_index[v]);
    amp_set(n, user_amp[v]);
    freq_set(n, freq[v]);
    pan_set(n, pan[v]);
    amp_mod_set(n, amp_mod_osc[v], amp_mod_depth[v]);
    freq_mod_set(n, freq_mod_osc[v], freq_mod_depth[v]);
    pan_mod_set(n, pan_mod_osc[v], pan_mod_depth[v]);
    wave_loop(n, loop_enabled[v]);
    wave_dir(n, direction[v]);
    quantize[n] = quantize[v];
    hold_max[n] = hold_max[v];
    ops.copy_hold_from[n] = v;
    envelope_init(n, env[v].a, env[v].d, env[v].s, env[v].r);
    cz_set(n, cz_mode[v], cz_distortion[v]);
    cmod_set(n, cz_mod_osc[v], cz_mod_depth[v]);
    filter_mode[n] = filter_mode[v];
    mmf_init(n, filter_freq[v], filter_res[v]);
  }

  void tempo_set(double m) {
    tempo_base = (float)m;
    tempo_bpm = (float)m / 4.0f;
    float bps = (float)m / 60.f;
    tempo_time_per_step = 1.0f / bps / 4.0f;
    dirty = true;
  }
  int queue_item(uint64_t when, const std::string &what, int voice) {
    for (int q = 0; q < QUEUE_SIZE; q++) {
      if (queue_state[q] == 0) {
        queue_when[q] = when;
        queue_what[q] = what;
        queue_voice[q] = voice;
        queue_state[q] = 2;
        return q;
      }
    }
    return -1;
  }
  void seq_state_set(int p, int state) {
    switch (state) {
      case 0: seq_state[p] = 0; seq_pointer[p] = 0; break;
      case 1: seq_state[p] = 1; seq_pointer[p] = 0; break;
      case 2: seq_state[p] = 2; break;
      case 3: seq_state[p] = 1; break;
    }
  }

  // :w load — parse the wav header for frames/rate, register a new table
  // generation (Python replays the data load on its bank)
  bool wave_load(int which, int where, int ch) {
    if (where < 200 || where >= 1199) return false;
    char name[64];
    snprintf(name, sizeof(name), "%d.wav", which);
    std::string path = script_dir + "/" + name;
    FILE *f = fopen(path.c_str(), "rb");
    if (!f) return false;
    uint8_t hdr[12];
    if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) != 0
        || memcmp(hdr + 8, "WAVE", 4) != 0) { fclose(f); return false; }
    int channels = 0, rate = 0, bits = 0;
    long data_size = -1;
    uint8_t ck[8];
    while (fread(ck, 1, 8, f) == 8) {
      uint32_t len = ck[4] | (ck[5] << 8) | (ck[6] << 16) | ((uint32_t)ck[7] << 24);
      if (memcmp(ck, "fmt ", 4) == 0) {
        uint8_t fmt[16];
        if (fread(fmt, 1, 16, f) != 16) break;
        channels = fmt[2] | (fmt[3] << 8);
        rate = fmt[4] | (fmt[5] << 8) | (fmt[6] << 16) | ((uint32_t)fmt[7] << 24);
        bits = fmt[14] | (fmt[15] << 8);
        if (len > 16) fseek(f, len - 16, SEEK_CUR);
      } else if (memcmp(ck, "data", 4) == 0) {
        data_size = len;
        break;
      } else {
        fseek(f, len + (len & 1), SEEK_CUR);
      }
    }
    fclose(f);
    if (data_size < 0 || channels <= 0 || bits != 16) return false;
    int frames = (int)(data_size / channels / 2);
    Slot &s = slots[where];
    s.valid = 1;
    s.size = frames;
    s.rate = (float)rate;
    s.one_shot = 1; s.loop_enabled = 0;
    s.loop_start = 1; s.loop_end = frames;
    s.midi_note = 69.0f;
    s.offset_hz = (float)frames / (float)rate * 440.0f;
    s.table_gen = next_gen;
    loads.push_back({which, where, ch, next_gen});
    next_gen++;
    dirty = true;
    return true;
  }
};

// ---------------- skode parser ----------------
struct Wire;  // fwd

struct Skode {
  std::string scr, num, defer_acc;
  std::vector<double> data;
  double defer_num = 0;
  char defer_mode = '?';
  double arg[8] = {};
  int arg_len = 0;
  std::string atom_acc;
  uint32_t atom = 0;            // packed 4-char atom; 0 = NIL
  int state = 0;
  double local_var[10] = {};
  double *global_var = local_var;
  Wire *w = nullptr;
  int mode = 0;

  void arg_clear() { arg_len = 0; }
  void arg_push(double d) { if (arg_len < 8) arg[arg_len++] = d; }
};

enum { S_START, S_NUM, S_VAR, S_DEFNUM, S_DEFSTR, S_ATOM, S_STR, S_ARR, S_COMMENT };

static bool is_number(char c) { return (c >= '0' && c <= '9') || c == '-' || c == '.'; }
static bool is_sep(char c) { return c == ' ' || c == '\t' || c == '\n' || c == '\v' || c == '\f' || c == '\r' || c == ','; }
static bool is_chunk_end(char c) { return c == ';' || c == 0x04; }
static bool is_defer(char c) { return c == '+' || c == '~'; }
static bool is_atomc(char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
         || strchr("!@%^&*_=:\"'<>?/", c) != nullptr;
}
static bool is_numex(char c) {
  return isxdigit((unsigned char)c) || strchr("-.eExX", c) != nullptr;
}

static double skode_strtod(const std::string &s) {
  if (s.size() == 1 && (s[0] == '-' || s[0] == 'e' || s[0] == '.')) return NAN;
  return strtod(s.c_str(), nullptr);
}

static uint32_t pack_atom(const std::string &a) {
  char buf[4] = {'_', '_', '_', '_'};
  for (size_t i = 0; i < a.size() && i < 4; i++) buf[i] = a[i];
  return ((uint32_t)(uint8_t)buf[0] << 24) | ((uint32_t)(uint8_t)buf[1] << 16)
       | ((uint32_t)(uint8_t)buf[2] << 8) | (uint32_t)(uint8_t)buf[3];
}
#define ATOM(s4) pack_atom(s4)

// ---------------- wire ----------------
struct Wire {
  Engine *e = nullptr;
  int voice = 0;
  float stack[8] = {};
  int stack_ptr = 0;
  int pattern = 0, step = -1;
  int output = 0, trace = 0, debug = 0, verbose = 0, quit = 0;
  float defer_last = 0;
  uint64_t defer_sample_time = 0;
  Skode sk;

  Wire(Engine *eng) : e(eng) { sk.w = this; sk.global_var = eng->global_var; }
  void run(const std::string &line);
};

static int wire_cb(Skode &s, int info);

static int skode_action(Skode &s, int state) {
  int pushes = 0;
  if (state == 100 /*CHUNK_END*/) {
    if (s.atom != 0) { pushes = wire_cb(s, 1); s.atom = 0; }
    if (!s.defer_acc.empty()) { wire_cb(s, 2); s.defer_acc.clear(); }
    wire_cb(s, 3);
    if (pushes == 0) s.arg_clear();
    return 0;
  }
  if (state == S_ATOM) {
    if (s.atom != 0) {
      if (wire_cb(s, 1) == 0) s.arg_clear();
      s.atom = 0;
    }
    s.atom = pack_atom(s.atom_acc);
    s.atom_acc.clear();
  } else if (state == S_NUM) {
    s.arg_push(skode_strtod(s.num));
    s.num.clear();
  } else if (state == S_DEFSTR) {
    wire_cb(s, 2);
    s.defer_acc.clear();
  }
  return S_START;
}

static void skode_feed(Skode &s, const std::string &line) {
  size_t i = 0, n = line.size();
  while (true) {
    if (i >= n) {
      if (s.state == S_ATOM || s.state == S_NUM) {
        skode_action(s, s.state);
        s.state = S_START;
      }
      break;
    }
    char c = line[i];
    bool reprocess = true;
    while (reprocess) {
      reprocess = false;
      switch (s.state) {
        case S_START:
          if (is_number(c)) { s.num.clear(); s.num.push_back(c); s.state = S_NUM; }
          else if (is_sep(c)) {}
          else if (c == '[') wire_cb(s, 4);
          else if (c == ']') wire_cb(s, 5);
          else if (c == '{') { s.scr.clear(); s.state = S_STR; }
          else if (c == '(') { s.num.clear(); s.data.clear(); s.state = S_ARR; }
          else if (c == '$') s.state = S_VAR;
          else if (c == '#') s.state = S_COMMENT;
          else if (is_chunk_end(c)) { skode_action(s, 100); s.state = S_START; }
          else if (is_defer(c)) { skode_action(s, 100); s.defer_mode = c; s.state = S_DEFNUM; }
          else if ((unsigned char)c < 0x20 || c == 0x7f) {}
          else { s.atom_acc.clear(); s.atom_acc.push_back(c); s.state = S_ATOM; }
          break;
        case S_NUM:
          if (is_number(c)) s.num.push_back(c);
          else if (c == '$') {}
          else { s.state = skode_action(s, S_NUM); reprocess = true; }
          break;
        case S_STR:
          if (c == '}') { wire_cb(s, 6); s.state = S_START; }
          else s.scr.push_back(c);
          break;
        case S_ARR:
          if (c == ')') {
            if (!s.num.empty()) { s.data.push_back(skode_strtod(s.num)); s.num.clear(); }
            wire_cb(s, 7);
            s.state = S_START;
          } else if (is_numex(c)) s.num.push_back(c);
          else if (is_sep(c)) {
            if (!s.num.empty()) { s.data.push_back(skode_strtod(s.num)); s.num.clear(); }
          }
          break;
        case S_COMMENT:
          if (is_chunk_end(c)) { skode_action(s, 100); s.state = S_START; }
          break;
        case S_VAR:
          if (c >= '0' && c <= '9') { s.arg_push(s.global_var[c - '0']); s.state = S_START; }
          else { s.state = S_START; reprocess = true; }
          break;
        case S_DEFNUM:
          if (is_number(c)) s.num.push_back(c);
          else {
            s.defer_num = skode_strtod(s.num);
            s.num.clear();
            s.state = S_DEFSTR;
            reprocess = true;
          }
          break;
        case S_DEFSTR:
          if (is_defer(c)) {
            s.defer_mode = c;
            skode_action(s, S_DEFSTR);
            s.state = S_DEFNUM;
          } else if (is_chunk_end(c)) {
            skode_action(s, S_DEFSTR);
            s.state = S_START;
          } else s.defer_acc.push_back(c);
          break;
        case S_ATOM:
          if (is_atomc(c)) {
            if (s.atom_acc.size() < 4) s.atom_acc.push_back(c);
          } else {
            skode_action(s, S_ATOM);
            s.state = S_START;
            reprocess = true;
          }
          break;
        default:
          skode_action(s, s.state);
          s.state = S_START;
          break;
      }
    }
    i++;
  }
  if (s.mode == 0) { skode_action(s, 100); s.state = S_START; }
}

void Wire::run(const std::string &line) { skode_feed(sk, line); }

static int wire_function(Skode &s) {
  Wire *w = s.w;
  Engine &e = *w->e;
  uint32_t atom = s.atom;
  int argc = s.arg_len;
  double *arg = s.arg;
  int voice = w->voice;
  int x = c_int(arg[0]);

  if (atom == ATOM("a")) { if (argc) e.amp_set(voice, arg[0]); }
  else if (atom == ATOM("A")) {
    if (argc == 1) e.amp_mod_set(voice, -1, 0);
    else if (argc > 1) e.amp_mod_set(voice, x, arg[1]);
  }
  else if (atom == ATOM("b")) e.wave_dir(voice, argc == 0 ? -1 : x);
  else if (atom == ATOM("B")) e.wave_loop(voice, argc == 0 ? -1 : x);
  else if (atom == ATOM("c")) {
    if (argc == 0) e.cz_set(voice, 0, 0.5);
    else if (argc == 1) e.cz_set(voice, x, 0.5);
    else e.cz_set(voice, x, arg[1]);
  }
  else if (atom == ATOM("C")) {
    if (argc <= 1) e.cmod_set(voice, x, -1);
    else e.cmod_set(voice, x, arg[1]);
  }
  else if (atom == ATOM("f")) { if (argc) e.freq_set(voice, arg[0]); }
  else if (atom == ATOM("F")) {
    if (argc <= 1) e.freq_mod_set(voice, x, -1);
    else e.freq_mod_set(voice, x, arg[1]);
  }
  else if (atom == ATOM("g")) {
    if (argc) {
      if (arg[0] <= 0) e.gliss_enable[voice] = 0;
      else { e.gliss_enable[voice] = 1; e.gliss_speed[voice] = (float)arg[0]; }
    }
  }
  else if (atom == ATOM("G")) {
    if (argc) {
      e.link_midi_a[voice] = (float)x;
      if (argc > 1) e.link_midi_b[voice] = (float)c_int(arg[1]);
    }
  }
  else if (atom == ATOM("h")) { if (argc) { e.hold_max[voice] = x; e.dirty = true; } }
  else if (atom == ATOM("H")) {
    if (argc) {
      e.link_velo_a[voice] = (float)x;
      if (argc > 1) e.link_velo_b[voice] = (float)c_int(arg[1]);
    }
  }
  else if (atom == ATOM("L")) { if (argc) e.link_trig[voice] = (float)x; }
  else if (atom == ATOM("J")) {
    if (argc) {
      e.filter_mode[voice] = x;
      e.mmf_set_params(voice, e.filter_freq[voice], e.filter_res[voice]);
      e.dirty = true;
    }
  }
  else if (atom == ATOM("K")) { if (argc) e.mmf_set_params(voice, (float)arg[0], e.filter_res[voice]); }
  else if (atom == ATOM("Q")) { if (argc && arg[0] > 0) e.mmf_set_params(voice, e.filter_freq[voice], (float)arg[0]); }
  else if (atom == ATOM("l")) {
    if (argc) {
      e.envelope_velocity(voice, arg[0]);
      if (e.link_velo_a[voice] >= 0) e.envelope_velocity((int)e.link_velo_a[voice], arg[0]);
      if (e.link_velo_b[voice] >= 0) e.envelope_velocity((int)e.link_velo_b[voice], arg[0]);
    }
  }
  else if (atom == ATOM("m")) { if (argc) e.wave_mute(voice, x); }
  else if (atom == ATOM("M")) { if (argc) e.tempo_set(arg[0]); }
  else if (atom == ATOM("n")) {
    if (argc) {
      e.freq_midi(voice, arg[0]);
      if (e.link_midi_a[voice] >= 0) e.freq_midi((int)e.link_midi_a[voice], arg[0]);
      if (e.link_midi_b[voice] >= 0) e.freq_midi((int)e.link_midi_b[voice], arg[0]);
    }
  }
  else if (atom == ATOM("N")) { if (argc) e.midi_transpose[voice] = (float)arg[0]; }
  else if (atom == ATOM("p")) { if (argc) e.pan_set(voice, arg[0]); }
  else if (atom == ATOM("P")) {
    if (argc <= 1) e.pan_mod_set(voice, x, -1);
    else e.pan_mod_set(voice, x, arg[1]);
  }
  else if (atom == ATOM("q")) { if (argc) { e.quantize[voice] = x; e.dirty = true; } }
  else if (atom == ATOM("r")) { if (argc) { e.record[voice] = x; e.dirty = true; } }
  else if (atom == ATOM("s")) {
    if (argc) {
      if (arg[0] <= 0) e.smoother_enable[voice] = 0;
      else { e.smoother_enable[voice] = 1; e.smoother_smoothing[voice] = (float)arg[0]; }
      e.dirty = true;
    }
  }
  else if (atom == ATOM("S")) { if (argc) e.wave_reset(voice, x); }
  else if (atom == ATOM("t")) { if (argc > 3) e.envelope_init(voice, (float)arg[0], (float)arg[1], (float)arg[2], (float)arg[3]); }
  else if (atom == ATOM("T")) {
    e.osc_trigger(voice);
    if (e.link_trig[voice] > 0) e.osc_trigger((int)e.link_trig[voice]);
  }
  else if (atom == ATOM("v")) { if (argc && x >= 0 && x < VOICE_MAX) w->voice = x; }
  else if (atom == ATOM("V")) {
    if (argc) {
      e.volume_user = (float)arg[0];
      e.volume_final = (float)arg[0] * AMY_FACTOR;
      e.dirty = true;
    }
  }
  else if (atom == ATOM("w")) { if (argc) e.wave_set(voice, x); }
  else if (atom == ATOM("x")) {
    if (argc) {
      if (x < 0) w->step++;
      else w->step = x;
      if (x >= 0 && x < SEQ_STEPS_MAX)
        e.seq_pattern[w->pattern][w->step] = s.scr;
    }
  }
  else if (atom == ATOM("y")) { if (argc) w->pattern = x; }
  else if (atom == ATOM("z")) { if (argc) e.seq_state_set(w->pattern, x); }
  else if (atom == ATOM("Z")) { if (argc) for (int p = 0; p < PATTERNS_MAX; p++) e.seq_state_set(p, x); }
  else if (atom == ATOM("l>g")) { if (argc && x >= 0 && x <= 9) s.global_var[x] = s.local_var[x]; }
  else if (atom == ATOM("g>l")) { if (argc && x >= 0 && x <= 9) s.local_var[x] = s.global_var[x]; }
  else if (atom == ATOM("/q") || atom == ATOM(":q")) { w->quit = -1; }
  else if (atom == ATOM("/d") || atom == ATOM(":d")) { w->debug = argc == 0 ? !w->debug : x; }
  else if (atom == ATOM("/i") || atom == ATOM(":i")) { w->output = argc == 0 ? !w->output : x; }
  else if (atom == ATOM("/t") || atom == ATOM(":t")) { w->trace = argc == 0 ? (w->trace ? 0 : 1) : x; }
  else if (atom == ATOM("/v") || atom == ATOM(":v")) { w->verbose = argc == 0 ? (w->verbose ? 0 : 1) : x; }
  else if (atom == ATOM("/l") || atom == ATOM(":l")) {
    if (argc) {
      char name[64];
      snprintf(name, sizeof(name), "%d.sk", x);
      std::string path = e.script_dir + "/" + name;
      FILE *f = fopen(path.c_str(), "r");
      if (f) {
        static thread_local Wire *skload_ctx = nullptr;
        // one persistent context shared by every nested load (wire.c:353)
        if (!skload_ctx || skload_ctx->e != &e) skload_ctx = new Wire(&e);
        char buf[4096];
        while (fgets(buf, sizeof(buf), f)) {
          size_t len = strlen(buf);
          if (len && buf[len - 1] == '\n') buf[len - 1] = 0;
          skload_ctx->run(buf);
        }
        fclose(f);
      }
    }
  }
  else if (atom == ATOM("/w") || atom == ATOM(":w")) {
    int which = 0, where = 200, ch = -1;
    if (argc >= 2) {
      which = c_int(arg[0]); where = c_int(arg[1]);
      if (argc > 2) ch = c_int(arg[2]);
    } else if (argc == 1) which = c_int(arg[0]);
    e.wave_load(which, where, ch);
  }
  else if (atom == ATOM("<")) {
    // recorder capture windows are compiled only by the Python oracle
    // (host/wire.py "<___": cap/window bookkeeping feeds io/recorder);
    // refuse so callers fall back instead of silently diverging
    e.unsupported = true;
  }
  else if (atom == ATOM("*")) { e.unsupported = true; }
  else if (atom == ATOM("/wex")) { e.unsupported = true; }
  else if (atom == ATOM(">")) { e.voice_copy(voice, x); }
  else if (atom == ATOM("/")) { e.wave_default(voice); }
  else if (atom == ATOM("%")) { e.seq_modulo[w->pattern] = x; }
  else if (atom == ATOM("!")) { e.seq_mute[w->pattern][x] = 0; }
  else if (atom == ATOM("@")) { e.seq_mute[w->pattern][x] = 1; }
  else if (atom == ATOM("=")) { if (argc > 1 && x >= 0 && x <= 9) s.global_var[x] = arg[1]; }
  // unknown atoms swallowed (wire.c:858)
  return 0;
}

static int wire_defer(Skode &s) {
  Wire *w = s.w;
  Engine &e = *w->e;
  if (w->defer_sample_time == 0) w->defer_sample_time = (uint64_t)e.sample_count;
  uint64_t dst = w->defer_sample_time;
  char mode = s.defer_mode;
  float t = (float)(s.defer_num + (double)w->defer_last);
  if (mode == '+') t *= e.tempo_time_per_step * 4.0f;
  t += w->defer_last;
  uint64_t qt = (uint64_t)(int64_t)(t * (float)SAMPLE_RATE) + dst;
  e.queue_item(qt, s.defer_acc, w->voice);
  w->defer_last += (float)s.defer_num;
  return 0;
}

static int wire_cb(Skode &s, int info) {
  Wire *w = s.w;
  switch (info) {
    case 1: return wire_function(s);
    case 2: return wire_defer(s);
    case 3:
      w->defer_last = 0;
      w->defer_sample_time = 0;
      return 0;
    case 4: {  // PUSH
      w->stack_ptr++;
      if (w->stack_ptr >= 8) w->stack_ptr = 0;
      w->stack[w->stack_ptr] = (float)w->voice;
      return 0;
    }
    case 5: {  // POP
      float n = w->stack[w->stack_ptr];
      w->stack_ptr--;
      if (w->stack_ptr < 0) w->stack_ptr = 7;
      w->voice = (int)n;
      return 0;
    }
    default:
      return 0;
  }
}

// ---------------- sequencer simulation + snapshots ----------------
struct Compiler {
  Engine e;
  Wire qctx, cctx, ectx;
  std::vector<std::vector<float>> seg_f32;
  std::vector<std::vector<int32_t>> seg_i32;
  std::vector<float> seg_scalar;
  std::vector<Ops> seg_ops;
  std::vector<int32_t> seg_of_block;
  std::vector<uint8_t> seg_is_start;

  Compiler() : qctx(&e), cctx(&e), ectx(&e) {}

  void snapshot();
  void tick(int frames);
};

// parameter layout — must mirror host/timeline.py PARAM_F32 / PARAM_I32
static const int NUM_F32 = 21 + 5;   // PARAM_F32 + b coefficients appended? no — see order below
// f32 params in order (timeline.py PARAM_F32):
//  phase_inc, loop_start_f, loop_end_f, amp, freq_mod_depth, freq_scale,
//  pan_mod_depth, amp_mod_depth, cz_mod_depth, cz_distortion,
//  smoother_smoothing, flt_b0, flt_b1, flt_b2, flt_a1, flt_a2,
//  env_attack, env_decay, env_sustain, env_release, env_velocity    (21)
// i32 params (PARAM_I32 + PARAM_I64_AS_I32):
//  table_key, table_size, table_index, one_shot, loop_enabled, loop_valid,
//  direction, hold_max, quantize, filter_mode, use_amp_envelope,
//  env_active, freq_mod_osc, amp_mod_osc, pan_mod_osc, cz_mod_osc,
//  cz_mode, disconnect, record, smoother_enable, env_start, env_rel_at (22)
constexpr int P_F32 = 21;
constexpr int P_I32 = 22;

void Compiler::snapshot() {
  std::vector<float> f(P_F32 * VOICE_MAX);
  std::vector<int32_t> i32(P_I32 * VOICE_MAX);
  float *fp = f.data();
  auto pf = [&](const float *src) { memcpy(fp, src, VOICE_MAX * 4); fp += VOICE_MAX; };
  pf(e.phase_inc); pf(e.loop_start_f); pf(e.loop_end_f); pf(e.amp);
  pf(e.freq_mod_depth); pf(e.freq_scale); pf(e.pan_mod_depth);
  pf(e.amp_mod_depth); pf(e.cz_mod_depth); pf(e.cz_distortion);
  pf(e.smoother_smoothing); pf(e.b0); pf(e.b1); pf(e.b2); pf(e.a1); pf(e.a2);
  {
    float tmp[VOICE_MAX];
    for (int v = 0; v < VOICE_MAX; v++) tmp[v] = e.env[v].attack; pf(tmp);
    for (int v = 0; v < VOICE_MAX; v++) tmp[v] = e.env[v].decay; pf(tmp);
    for (int v = 0; v < VOICE_MAX; v++) tmp[v] = e.env[v].sustain; pf(tmp);
    for (int v = 0; v < VOICE_MAX; v++) tmp[v] = e.env[v].release; pf(tmp);
    for (int v = 0; v < VOICE_MAX; v++) tmp[v] = e.env[v].velocity; pf(tmp);
  }
  int32_t *ip = i32.data();
  auto pi = [&](const int32_t *src) { memcpy(ip, src, VOICE_MAX * 4); ip += VOICE_MAX; };
  pi(e.table_key); pi(e.table_size); pi(e.table_index); pi(e.one_shot);
  pi(e.loop_enabled); pi(e.loop_valid); pi(e.direction); pi(e.hold_max);
  pi(e.quantize); pi(e.filter_mode); pi(e.use_amp_envelope);
  {
    int32_t tmp[VOICE_MAX];
    for (int v = 0; v < VOICE_MAX; v++) tmp[v] = e.env[v].active; pi(tmp);
  }
  pi(e.freq_mod_osc); pi(e.amp_mod_osc); pi(e.pan_mod_osc); pi(e.cz_mod_osc);
  pi(e.cz_mode); pi(e.disconnect); pi(e.record); pi(e.smoother_enable);
  {
    int32_t tmp[VOICE_MAX];
    for (int v = 0; v < VOICE_MAX; v++) tmp[v] = (int32_t)e.env[v].start; pi(tmp);
    for (int v = 0; v < VOICE_MAX; v++) tmp[v] = (int32_t)e.env[v].rel_at; pi(tmp);
  }
  seg_f32.push_back(std::move(f));
  seg_i32.push_back(std::move(i32));
  seg_scalar.push_back(e.volume_final);
  seg_ops.push_back(e.ops);
  e.ops.clear();
  e.dirty = false;
}

void Compiler::tick(int frames) {
  uint64_t limit = (uint64_t)e.sample_count + (uint64_t)frames;
  for (int q = 0; q < QUEUE_SIZE; q++) {
    if (e.queue_state[q] == 2 && e.queue_when[q] <= limit) {
      e.queue_state[q] = 3;
      qctx.voice = e.queue_voice[q];
      qctx.run(e.queue_what[q]);
      e.queue_state[q] = 0;
    }
  }
  float frame_time = (float)frames / (float)SAMPLE_RATE;
  e.seq_clock_sec += (double)frame_time;
  if (e.seq_clock_sec >= (double)e.tempo_time_per_step) {
    e.seq_clock_sec -= (double)e.tempo_time_per_step;
    for (int p = 0; p < PATTERNS_MAX; p++) {
      if (e.seq_state[p] != 1) continue;
      if (e.seq_modulo[p] > 1) {
        if ((e.seq_counter[p] % e.seq_modulo[p]) != 0) { e.seq_counter[p]++; continue; }
      }
      e.seq_counter[p]++;
      int ptr = e.seq_pointer[p];
      if (e.seq_mute[p][ptr] == 0) cctx.run(e.seq_pattern[p][ptr]);
      e.seq_pointer[p]++;
      int nxt = e.seq_pointer[p];
      if (nxt >= SEQ_STEPS_MAX || e.seq_pattern[p][nxt].empty()) e.seq_pointer[p] = 0;
    }
  }
}

}  // namespace

// ---------------- C ABI ----------------
extern "C" {

struct SkcSlotMeta {
  int32_t valid, size;
  float rate;
  int32_t one_shot, loop_enabled, loop_start, loop_end;
  float midi_note, offset_hz;
  int32_t table_gen;
};

struct SkcOut {
  int32_t num_segments;
  int32_t num_blocks;
  float *f32;          // [S, P_F32, V]
  int32_t *i32;        // [S, P_I32, V]
  float *scalars;      // [S] volume_final
  uint8_t *ops;        // [S, OPS_BYTES]
  int32_t *seg_of_block;
  uint8_t *seg_is_start;
  int32_t num_loads;
  int32_t *loads;      // [num_loads, 4] which, where, ch, gen
  int32_t num_keys;
  int32_t *bind_gens;  // [num_keys] table key -> generation
  int64_t sample_count;
};

int skc_compile(const char **lines, int nlines, const char *script_dir,
                double seconds, int block,
                const SkcSlotMeta *slots, int nslots,
                const double *events_t, const char **events_s, int nevents,
                SkcOut *out) {
  Compiler c;
  c.e.script_dir = script_dir ? script_dir : ".";
  for (int i = 0; i < nslots && i < WAVE_TABLE_MAX; i++) {
    Slot &s = c.e.slots[i];
    s.valid = slots[i].valid;
    s.size = slots[i].size;
    s.rate = slots[i].rate;
    s.one_shot = slots[i].one_shot;
    s.loop_enabled = slots[i].loop_enabled;
    s.loop_start = slots[i].loop_start;
    s.loop_end = slots[i].loop_end;
    s.midi_note = slots[i].midi_note;
    s.offset_hz = slots[i].offset_hz;
    s.table_gen = slots[i].table_gen;
  }
  c.e.next_gen = 0;
  for (int i = 0; i < nslots; i++)
    if (slots[i].table_gen >= c.e.next_gen) c.e.next_gen = slots[i].table_gen + 1;

  c.e.voice_init();
  c.e.dirty = true;

  Wire top(&c.e);
  for (int i = 0; i < nlines; i++) top.run(lines[i]);
  if (c.e.unsupported) return 2;   // caller falls back to the Python path

  int64_t total = (int64_t)(seconds * SAMPLE_RATE);
  int nb = (int)((total + block - 1) / block);

  // external events (samples, line), sorted by caller
  int epos = 0;

  c.seg_of_block.resize(nb);
  c.seg_is_start.assign(nb, 0);
  c.snapshot();
  for (int k = 0; k < nb; k++) {
    c.seg_of_block[k] = (int)c.seg_f32.size() - 1;
    c.e.sample_count += block;
    // external events before queue drain (timeline.py _SeqSim order)
    uint64_t limit = (uint64_t)c.e.sample_count + (uint64_t)block;
    while (epos < nevents && (uint64_t)(int64_t)(events_t[epos]) <= limit) {
      c.ectx.run(events_s[epos]);
      epos++;
    }
    c.tick(block);
    if (c.e.dirty && k + 1 < nb) {
      c.snapshot();
      c.seg_is_start[k + 1] = 1;
    }
  }
  if (nb) c.seg_is_start[0] = 1;
  // sequencer cells / deferred strings may also hit recorder atoms
  if (c.e.unsupported) return 2;

  int S = (int)c.seg_f32.size();
  out->num_segments = S;
  out->num_blocks = nb;
  out->f32 = (float *)malloc((size_t)S * P_F32 * VOICE_MAX * 4);
  out->i32 = (int32_t *)malloc((size_t)S * P_I32 * VOICE_MAX * 4);
  out->scalars = (float *)malloc((size_t)S * 4);
  size_t ops_bytes = sizeof(Ops);
  out->ops = (uint8_t *)malloc((size_t)S * ops_bytes);
  for (int s = 0; s < S; s++) {
    memcpy(out->f32 + (size_t)s * P_F32 * VOICE_MAX, c.seg_f32[s].data(),
           (size_t)P_F32 * VOICE_MAX * 4);
    memcpy(out->i32 + (size_t)s * P_I32 * VOICE_MAX, c.seg_i32[s].data(),
           (size_t)P_I32 * VOICE_MAX * 4);
    out->scalars[s] = c.seg_scalar[s];
    memcpy(out->ops + (size_t)s * ops_bytes, &c.seg_ops[s], ops_bytes);
  }
  out->seg_of_block = (int32_t *)malloc((size_t)nb * 4);
  memcpy(out->seg_of_block, c.seg_of_block.data(), (size_t)nb * 4);
  out->seg_is_start = (uint8_t *)malloc(nb ? nb : 1);
  memcpy(out->seg_is_start, c.seg_is_start.data(), nb);
  out->num_loads = (int32_t)c.e.loads.size();
  out->loads = (int32_t *)malloc(sizeof(int32_t) * 4 * (c.e.loads.size() + 1));
  for (size_t i = 0; i < c.e.loads.size(); i++) {
    out->loads[i * 4 + 0] = c.e.loads[i].which;
    out->loads[i * 4 + 1] = c.e.loads[i].where;
    out->loads[i * 4 + 2] = c.e.loads[i].ch;
    out->loads[i * 4 + 3] = c.e.loads[i].gen;
  }
  out->num_keys = (int32_t)c.e.bind_gens.size();
  out->bind_gens = (int32_t *)malloc(sizeof(int32_t) * (c.e.bind_gens.size() + 1));
  for (size_t i = 0; i < c.e.bind_gens.size(); i++)
    out->bind_gens[i] = c.e.bind_gens[i];
  out->sample_count = c.e.sample_count;
  return 0;
}

void skc_free(SkcOut *out) {
  free(out->f32); free(out->i32); free(out->scalars); free(out->ops);
  free(out->seg_of_block); free(out->seg_is_start); free(out->loads);
  free(out->bind_gens);
}

int skc_ops_bytes(void) { return (int)sizeof(Ops); }
int skc_num_f32(void) { return P_F32; }
int skc_num_i32(void) { return P_I32; }

}  // extern "C"
