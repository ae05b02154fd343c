#!/usr/bin/env python3
"""Fit duck's grisu stop/certification rule from raw digit traces.

Inputs:
  /tmp/grisu_traces.txt   (graft.tools.Grisu32Trace: B<bits>, H,k,diff,delta,one,-e, steps digit,rem,err,unit,div,exp)
  /tmp/duck_float_renders.tsv  (bits \t duck render)

For each float, locate the step duck's output corresponds to (digit-prefix
match with weed-decrement tolerance on the last digit), then print the
stop-opportunity tuples duck ACCEPTED vs REJECTED (rem < err but duck kept
generating) so the separating condition can be identified.
"""
import sys, re
from collections import defaultdict

duck = {}
for line in open('/tmp/duck_float_renders.tsv'):
    bits, r = line.rstrip('\n').split('\t')
    duck[int(bits)] = r

def digits_of(render):
    m = render.lstrip('-')
    mant = m.split('e')[0].replace('.', '')
    return mant.lstrip('0').rstrip('0') or '0'

traces = {}
cur = None
for line in open('/tmp/grisu_traces.txt'):
    line = line.rstrip('\n')
    if line.startswith('B'):
        cur = int(line[1:]); traces[cur] = {'H': None, 'steps': []}
    elif line.startswith('H,'):
        traces[cur]['H'] = [int(x) for x in line.split(',')[1:]]
    else:
        traces[cur]['steps'].append([int(x) for x in line.split(',')])

accepted, rejected = [], []
unmatched = 0
for bits, tr in traces.items():
    if bits not in duck: continue
    dd = digits_of(duck[bits])
    steps = tr['steps']
    raw = ''.join(str(s[0]) for s in steps)
    # strip leading zeros of the trace (value < 1 at scaled magnitude)
    lead = 0
    while lead < len(raw) and raw[lead] == '0': lead += 1
    # candidate stop steps: n where prefix matches and last digit within
    # weed tolerance (0..4 decrements), or trailing zeros stripped
    n_found = None; n_adjust = None
    for n in range(1, len(steps) + 1):
        gen = raw[:n].lstrip('0') or '0'
        gi = int(gen)
        di = int(dd)
        # duck digits may be the truncated prefix, the prefix rounded up
        # (+1 with carries), with trailing zeros stripped either way
        for adj in (0, 1):
            cand = str(gi + adj).rstrip('0') or '0'
            if cand == dd:
                n_found, n_adjust = n, adj
                break
        if n_found is not None: break
    if n_found is None:
        unmatched += 1
        if unmatched <= 5: print("UNMATCHED", bits, duck[bits], raw[:12])
        continue
    for i, s in enumerate(steps[:n_found], start=1):
        d, rem, err, unit, div, exp = s
        stop_possible = (rem % 2**64) < (err % 2**64)
        if not stop_possible: continue
        tup = (rem, err, tr['H'][1], unit, div, i, n_adjust)
        if i == n_found: accepted.append(tup)
        else: rejected.append(tup)

print(f"floats={len(traces)} unmatched={unmatched} accepted={len(accepted)} rejected={len(rejected)}")
# examine rejected: what separates them from accepted?
def ratios(tups, name):
    import statistics
    rs = []
    for rem, err, diff, unit, div, i, adj in tups[:200000]:
        du = diff * unit
        rs.append((rem / du if du else 0, (err - rem) / div if div else 0))
    if rs:
        a = sorted(r[0] for r in rs); b = sorted(r[1] for r in rs)
        print(name, "rem/(diff*unit): min %.4f p5 %.4f med %.4f p95 %.4f max %.4f" %
              (a[0], a[len(a)//20], a[len(a)//2], a[len(a)*19//20], a[-1]))
        print(name, "(err-rem)/div:   min %.4f p5 %.4f med %.4f p95 %.4f max %.4f" %
              (b[0], b[len(b)//20], b[len(b)//2], b[len(b)*19//20], b[-1]))
ratios(accepted, "ACC")
ratios(rejected, "REJ")
for t in rejected[:12]: print("REJ", t)
adj_at_stop = defaultdict(int)
for rem, err, diff, unit, div, i, adj in accepted:
    adj_at_stop[adj] += 1
print("adjust distribution at accepted stops:", dict(adj_at_stop))
# how does adj relate to remainder vs divisor/2?
mis=0
for rem, err, diff, unit, div, i, adj in accepted:
    predicted = 1 if 2*(rem % 2**64) >= div else 0
    if predicted != adj: mis += 1
print("half-up prediction misses:", mis, "of", len(accepted))
