/* skode_oracle — parser-transcript oracle for skred_tpu test suite.
 *
 * Reads wire-language text from stdin (one chunk per line, mirroring how
 * wire() feeds the parser) and prints every parser event in a fixed
 * machine-readable format.  Links against the *reference* parser compiled
 * from /root/reference/skode.c; the Python port in
 * skred_tpu/lang/skode.py must produce byte-identical transcripts.
 *
 * This file is our own test infrastructure, not part of the framework.
 */
#include <stdio.h>
#include <string.h>
#include "skode.h"

static double global_var[10];

static int cb(skode_t *s, int info) {
  switch (info) {
    case FUNCTION: {
      printf("F %s [", skode_atom_string(s));
      for (int n = 0; n < skode_arg_len(s); n++) printf(" %.17g", skode_arg(s)[n]);
      printf(" ]\n");
      /* mirror wire: '=' writes a variable */
      if (skode_atom_num(s) == '=___' && skode_arg_len(s) > 1) {
        int n = (int)skode_arg(s)[0];
        if (n >= 0 && n <= 9) skode_set_local(s, n, skode_arg(s)[1]);
      }
      break;
    }
    case DEFER:
      printf("D %c %.17g '%s'\n", skode_defer_mode(s), skode_defer_num(s),
             skode_defer_string(s));
      break;
    case CHUNK_END:
      printf("C\n");
      break;
    case GOT_STRING:
      printf("S '%s'\n", skode_string(s));
      break;
    case GOT_ARRAY: {
      printf("A [");
      for (int i = 0; i < skode_data_len(s); i++) printf(" %.17g", skode_data(s)[i]);
      printf(" ]\n");
      break;
    }
    case PUSH:
      printf("P\n");
      break;
    case POP:
      printf("O\n");
      break;
    default:
      printf("U %d\n", info);
      break;
  }
  return 0;
}

int main(void) {
  skode_t *s = skode_new(cb, NULL);
  skode_set_global(s, global_var);
  char line[65536];
  while (fgets(line, sizeof(line), stdin) != NULL) {
    size_t len = strlen(line);
    if (len > 0 && line[len - 1] == '\n') line[len - 1] = '\0';
    skode(s, line, cb);
  }
  skode_free(s);
  return 0;
}
