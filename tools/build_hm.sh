#!/bin/bash
# Build HM-16.5 reference decoder + encoder binaries from the read-only
# reference mount (/root/reference) as test oracles:
#   - TAppDecoderStatic: conformance oracle (decodes our bitstreams, checks MD5 SEI)
#   - TAppEncoderStatic (Extract_Data tree): vanilla-RDO baseline encoder + label dumper
# Objects/binaries land in /root/repo/tools/hm/; the reference tree is never written.
# See SURVEY.md section 4: reference decoder + decoded-picture-hash SEI are the
# natural oracles (HM-16.5_Test_AI/source/Lib/TLibDecoder, SEIEncoder.cpp:290-310).
set -e
REF=/root/reference/HM-16.5_Test_AI/source
REF_ENC=/root/reference/HM-16.5_Extract_Data/source
OUT=/root/repo/tools/hm
mkdir -p $OUT/obj_dec $OUT/obj_enc
CXXFLAGS="-O2 -w -fpermissive -std=gnu++98 -DNDEBUG"
CFLAGS="-O2 -w"

build_tree() {
  local SRC=$1; local OBJDIR=$2; local BIN=$3; shift 3
  local DIRS=("$@")
  local objs=()
  for d in "${DIRS[@]}"; do
    for f in $SRC/$d/*.cpp; do
      local o=$OBJDIR/$(echo ${f#$SRC/} | tr '/' '_' | sed 's/\.cpp$/.o/')
      objs+=($o)
      if [ ! -f $o ] || [ $f -nt $o ]; then
        echo "CXX $f"
        g++ $CXXFLAGS -I$SRC/Lib -I$SRC/App -c $f -o $o &
        while [ $(jobs -r | wc -l) -ge 2 ]; do wait -n; done
      fi
    done
  done
  for f in $SRC/Lib/libmd5/*.c; do
    local o=$OBJDIR/libmd5_$(basename $f .c).o
    objs+=($o)
    [ -f $o ] || gcc $CFLAGS -I$SRC/Lib -c $f -o $o
  done
  wait
  g++ -O2 -o $BIN "${objs[@]}" -lpthread
  echo "BUILT $BIN"
}

if [ ! -x $OUT/TAppDecoderStatic ]; then
  build_tree $REF $OUT/obj_dec $OUT/TAppDecoderStatic \
    Lib/TLibCommon Lib/TLibDecoder Lib/TLibVideoIO Lib/TAppCommon App/TAppDecoder
fi
if [ ! -x $OUT/TAppEncoderStatic ]; then
  build_tree $REF_ENC $OUT/obj_enc $OUT/TAppEncoderStatic \
    Lib/TLibCommon Lib/TLibDecoder Lib/TLibEncoder Lib/TLibVideoIO Lib/TAppCommon App/TAppEncoder
fi
echo DONE
