#!/bin/bash
# Download + untar one LibriTTS corpus part from OpenSLR (the reference's
# stage -1 helper, examples/libritts/cosyvoice/local/download_and_untar.sh).
# Usage: download_and_untar.sh [--remove-archive] <data-base> <url-base> <part>
set -e

remove_archive=false
if [ "$1" == --remove-archive ]; then
  remove_archive=true
  shift
fi
if [ $# -ne 3 ]; then
  echo "Usage: $0 [--remove-archive] <data-base> <url-base> <corpus-part>" >&2
  echo "e.g.: $0 /data/tts www.openslr.org/resources/60 dev-clean" >&2
  exit 1
fi
data=$1; url=$2; part=$3
[ -d "$data" ] || { echo "$0: no such directory $data" >&2; exit 1; }

if [ -f "$data/LibriTTS/.complete_$part" ]; then
  echo "$0: $part already downloaded and extracted"
  exit 0
fi
archive="$data/$part.tar.gz"
if [ ! -f "$archive" ]; then
  echo "$0: fetching $url/$part.tar.gz"
  wget -c -O "$archive" "https://$url/$part.tar.gz" || wget -c -O "$archive" "http://$url/$part.tar.gz"
fi
tar -xzf "$archive" -C "$data"
touch "$data/LibriTTS/.complete_$part"
$remove_archive && rm -f "$archive"
echo "$0: done $part"
