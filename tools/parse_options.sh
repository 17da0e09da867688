#!/usr/bin/env bash
# Parse --name value / --name=value options into shell variables, Kaldi-recipe
# style (behavioral counterpart of reference tools/parse_options.sh): for an
# option --foo-bar X to be accepted, the script must have declared a default
# `foo_bar=...` before sourcing this file. Remaining positional args stay in $@.
#
# Usage (inside a run.sh):
#   stage=0
#   nj=4
#   . tools/parse_options.sh
#   echo "stage=$stage nj=$nj positional=$@"

while true; do
  case "${1:-}" in
    --help|-h)
      # print the calling script's leading comment block as help, if any
      sed -n '2,/^[^#]/{/^#/s/^# \{0,1\}//p}' "$0" 1>&2 || true
      exit 0
      ;;
    --*=*)
      name="${1%%=*}"; name="${name#--}"; name="${name//-/_}"
      value="${1#*=}"
      if ! eval '[ -n "${'"$name"'+set}" ]'; then
        echo "$0: unknown option --${name//_/-}" 1>&2; exit 1
      fi
      eval "$name=\"\$value\""
      shift
      ;;
    --*)
      name="${1#--}"; name="${name//-/_}"
      if [ $# -lt 2 ]; then
        echo "$0: option $1 needs a value" 1>&2; exit 1
      fi
      if ! eval '[ -n "${'"$name"'+set}" ]'; then
        echo "$0: unknown option $1" 1>&2; exit 1
      fi
      eval "$name=\"\$2\""
      shift 2
      ;;
    *)
      break
      ;;
  esac
done

true
