/* render_golden — offline driver around the reference skred engine.
 *
 * Replaces the miniaudio real-time callback with a deterministic render
 * loop so the reference engine can mint golden audio for the skred_tpu
 * test-suite.  Links against the reference sources compiled in place
 * (synth.c, seq.c, wire.c, skode.c, miniwav.c, amysamples.c, udp.c,
 * util.c); this driver supplies the globals normally defined by skred.c
 * and mirrors synth_callback's per-block order: synth() then seq() then
 * record-capture (reference: skred.c:107-152).
 *
 * Usage:
 *   render_golden -W dump.bin                    dump wavetable bank, exit
 *   render_golden [-d sec] [-o out.f32] [-c cap.f32] [-e "cmd"] [-S] [f.sk]
 *     -d sec     render duration (default 10.0)
 *     -o out.f32 interleaved stereo f32 output
 *     -c cap.f32 per-voice capture (frames × 64 voices × 2 ch, f32)
 *     -e cmd     execute a wire command before rendering (repeatable)
 *     -S         after script execution, print voice/pattern state dump
 *
 * This is test infrastructure for golden minting, not part of the framework.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

#include "skred.h"
#include "scope-shared.h"
#include "synth-types.h"
#include "synth.h"
#include "wire.h"
#include "seq.h"

/* ---- globals normally defined in skred.c ---- */
int scope_enable = 0;
scope_buffer_t scope_safety;
scope_buffer_t *scope = &scope_safety;

float tempo_time_per_step = 60.0f;   /* skred.c:47 */
float tempo_bpm = 120.0f / 4.0f;     /* skred.c:48 */
float tempo_base = 0.0f;             /* skred.c:49 */

int debug = 0;
int console_voice = 0;

int rec_state = 0;
long rec_ptr = 0;
float rec_sec = 30.0f;
long rec_max = 0;
float *recording = NULL;

/* per-callback per-voice stereo capture (skred.c:88) */
static float one_skred_frame[SYNTH_FRAMES_PER_CALLBACK * AUDIO_CHANNELS * VOICE_MAX];

static void dump_wavetables(const char *path) {
  FILE *f = fopen(path, "wb");
  if (!f) { perror("dump"); exit(1); }
  for (int i = 0; i < WAVE_TABLE_MAX; i++) {
    if (wave_table_data[i] == NULL || wave_size[i] <= 0) continue;
    int32_t slot = i, size = wave_size[i];
    int32_t one_shot = wave_one_shot[i], loop_en = wave_loop_enabled[i];
    int32_t ls = wave_loop_start[i], le = wave_loop_end[i];
    float rate = wave_rate[i], midi = wave_midi_note[i], ohz = wave_offset_hz[i];
    fwrite(&slot, 4, 1, f); fwrite(&size, 4, 1, f);
    fwrite(&rate, 4, 1, f); fwrite(&one_shot, 4, 1, f);
    fwrite(&loop_en, 4, 1, f); fwrite(&ls, 4, 1, f); fwrite(&le, 4, 1, f);
    fwrite(&midi, 4, 1, f); fwrite(&ohz, 4, 1, f);
    fwrite(wave_table_data[i], 4, size, f);
  }
  int32_t end = -1;
  fwrite(&end, 4, 1, f);
  fclose(f);
}

static void state_dump(void) {
  static char buf[65536];
  for (int v = 0; v < VOICE_MAX; v++) {
    voice_format(v, buf, 0);
    printf("V%d %s\n", v, buf);
  }
  printf("TEMPO %.9g %.9g %.9g\n", tempo_base, tempo_bpm, tempo_time_per_step);
  for (int p = 0; p < PATTERNS_MAX; p++) {
    printf("PAT %d state=%d ptr=%d ctr=%d mod=%d\n", p,
           seq_state[p], seq_pointer[p], seq_counter[p], seq_modulo[p]);
    for (int s = 0; s < SEQ_STEPS_MAX; s++) {
      if (seq_pattern[p][s][0] == '\0' && seq_pattern_mute[p][s] == 0) continue;
      printf("CELL %d %d mute=%d {%s}\n", p, s, seq_pattern_mute[p][s],
             seq_pattern[p][s]);
    }
  }
  for (int q = 0; q < QUEUE_SIZE; q++) {
    if (work_queue[q].state != Q_FREE) {
      printf("QUEUED %d %llu v%d {%s}\n", q,
             (unsigned long long)work_queue[q].when, work_queue[q].voice,
             work_queue[q].what);
    }
  }
}

int main(int argc, char **argv) {
  const char *out_path = NULL, *cap_path = NULL, *dump_path = NULL;
  const char *script = NULL;
  double seconds = 10.0;
  int do_state_dump = 0, post_state_dump = 0;
  char *execs[64]; int nexec = 0;

  for (int i = 1; i < argc; i++) {
    if (!strcmp(argv[i], "-d")) seconds = atof(argv[++i]);
    else if (!strcmp(argv[i], "-o")) out_path = argv[++i];
    else if (!strcmp(argv[i], "-c")) cap_path = argv[++i];
    else if (!strcmp(argv[i], "-W")) dump_path = argv[++i];
    else if (!strcmp(argv[i], "-e")) execs[nexec++] = argv[++i];
    else if (!strcmp(argv[i], "-S")) do_state_dump = 1;
    else if (!strcmp(argv[i], "-R")) post_state_dump = 1;
    else script = argv[i];
  }

  /* init mirrors skred.c main (skred.c:232-237) minus audio/udp/threads */
  rec_max = (long)(rec_sec * MAIN_SAMPLE_RATE * AUDIO_CHANNELS * VOICE_MAX);
  recording = (float *)calloc(rec_max, sizeof(float));
  synth_init();
  wave_table_init();
  voice_init();
  seq_init();

  /* execute the script at t=0 through one persistent wire context,
   * mirroring sk_load (wire.c:342-368) */
  wire_t w = WIRE();
  if (script) {
    FILE *in = fopen(script, "r");
    if (!in) { perror(script); return 1; }
    char line[4096];
    while (fgets(line, sizeof(line), in) != NULL) {
      size_t len = strlen(line);
      if (len > 0 && line[len - 1] == '\n') line[len - 1] = '\0';
      wire(line, &w);
    }
    fclose(in);
  }
  for (int i = 0; i < nexec; i++) wire(execs[i], &w);

  /* Determinism fix for a reference bug: wave_load's channel-select loop
   * (miniwav.c:132-142, signed/unsigned `ch > outputChannels` comparison)
   * reads one float past the decoded buffer for a user slot's final
   * sample — uninitialized heap, varying between runs.  Define it as 0
   * so goldens are reproducible (matches skred_tpu's loader). */
  for (int i = EXT_SAMPLE_000; i < EXT_SAMPLE_999; i++) {
    if (wave_table_data[i] && wave_size[i] > 0) {
      wave_table_data[i][wave_size[i] - 1] = 0.0f;
    }
  }

  if (dump_path) { dump_wavetables(dump_path); return 0; }

  if (do_state_dump) { state_dump(); }

  if (!out_path && !cap_path && !post_state_dump) return 0;

  long total_frames = (long)(seconds * MAIN_SAMPLE_RATE);
  long blocks = (total_frames + SYNTH_FRAMES_PER_CALLBACK - 1) / SYNTH_FRAMES_PER_CALLBACK;
  FILE *out = out_path ? fopen(out_path, "wb") : NULL;
  FILE *cap = cap_path ? fopen(cap_path, "wb") : NULL;

  float buffer[SYNTH_FRAMES_PER_CALLBACK * AUDIO_CHANNELS];
  for (long b = 0; b < blocks; b++) {
    int frames = SYNTH_FRAMES_PER_CALLBACK;
    /* reference callback order: synth, seq, record (skred.c:116-131) */
    synth(buffer, NULL, frames, AUDIO_CHANNELS, one_skred_frame);
    seq(frames);
    if (rec_state) {
      float *f = one_skred_frame;
      for (int i = 0; i < frames * AUDIO_CHANNELS * VOICE_MAX; i += 2) {
        if (rec_ptr < rec_max) {
          recording[rec_ptr++] = f[i];
          recording[rec_ptr++] = f[i + 1];
        } else { rec_state = 0; break; }
      }
    }
    if (out) fwrite(buffer, sizeof(float), frames * AUDIO_CHANNELS, out);
    if (cap) fwrite(one_skred_frame, sizeof(float),
                    frames * AUDIO_CHANNELS * VOICE_MAX, cap);
  }
  if (out) fclose(out);
  if (cap) fclose(cap);
  if (post_state_dump) {
    printf("SAMPLE_COUNT %llu\n", (unsigned long long)synth_sample_count);
    state_dump();
  }
  return 0;
}
