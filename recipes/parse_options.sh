#!/usr/bin/env bash
# Kaldi-style option parser (the reference vendors utils/parse_options.sh in
# every recipe): maps --foo-bar VALUE to shell variable foo_bar=VALUE.
while true; do
  [ -z "${1:-}" ] && break
  case "$1" in
    --*)
      name=$(echo "$1" | sed s/^--// | sed s/-/_/g)
      eval '[ -z "${'"$name"'+x}" ]' && echo "$0: invalid option $1" >&2 && exit 1
      eval "$name=\"$2\""
      shift 2
      ;;
    *) break ;;
  esac
done
true
