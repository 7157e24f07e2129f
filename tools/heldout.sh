#!/bin/sh
# Held-out table evaluation (VERDICT r4 missing #2): fit the rANS tables
# on one half of the 512^2 corpus, sweep RD on the other half, both
# directions. The shipped tables.npz is fit on everything (like the
# reference's author-corpus tables, bandcodec.cpp:607-745); this measures
# how much of the rate/RD parity is fit-on-test inflation.
#
# Split (alphabetical halves of corpus/c512_*.pgm):
#   A: china darkwood dogskin flower grass hopper
#   B: marble silver skin skybox teapot wood
# The full-size natural images (alien, blade, freedom) carry content that
# appears in neither eval half, so both fits keep them; full-size
# china/flower/hopper go only to fit-A, full-size teapot only to fit-B
# (content leakage would defeat the split).
#
# Usage: sh tools/heldout.sh   (writes build/tables_fit{A,B}.npz and
#        build/heldout_{AonB,BonA}.log)
set -e
cd "$(dirname "$0")/.."
mkdir -p build

A_FIT="c512_china,c512_darkwood,c512_dogskin,c512_flower,c512_grass,c512_hopper,china.,flower.,hopper.,alien,blade,freedom"
B_FIT="c512_marble,c512_silver,c512_skin,c512_skybox,c512_teapot,c512_wood,teapot.,alien,blade,freedom"
B_EVAL="corpus/c512_marble.pgm corpus/c512_silver.pgm corpus/c512_skin.pgm corpus/c512_skybox.pgm corpus/c512_teapot.pgm corpus/c512_wood.pgm"
A_EVAL="corpus/c512_china.pgm corpus/c512_darkwood.pgm corpus/c512_dogskin.pgm corpus/c512_flower.pgm corpus/c512_grass.pgm corpus/c512_hopper.pgm"

echo "== fitting tables on split A =="
python tools/tablegen.py build/tables_fitA.npz --only "$A_FIT"
echo "== fitting tables on split B =="
python tools/tablegen.py build/tables_fitB.npz --only "$B_FIT"

echo "== sweeping held-out half B with fit-A tables =="
RIC_TABLES=build/tables_fitA.npz python tools/rd_sweep.py $B_EVAL \
    2>&1 | tee build/heldout_AonB.log
echo "== sweeping held-out half A with fit-B tables =="
RIC_TABLES=build/tables_fitB.npz python tools/rd_sweep.py $A_EVAL \
    2>&1 | tee build/heldout_BonA.log
echo "heldout: done"
