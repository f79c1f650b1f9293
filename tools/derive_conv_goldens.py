"""Hand-derivation of FULL conv-layer analytic goldens (scalar math only).

Extends ``tests/golden/pna_analytic.json`` (aggregation+scaler math) to a
complete PNAConv layer — edge_encoder → pre_nn → aggregate+scale →
post_nn → lin — and a complete GINEConv layer, so the layer *wiring* no
longer rests on the builder's torch reimplementation (VERDICT r4 next-step
#6; reference wiring: ``/root/reference/src/nn/gnn/pna.py:48-101`` —
PyG PNAConv towers=1, pre_layers=1, post_layers=1, divide_input=False —
and ``gine.py:37-91`` — PyG GINEConv with nn = Linear→ReLU→Linear).

RULES OF THIS FILE: python's scalar ``math`` module and list literals
ONLY.  No numpy, no jax, no torch, no code imported from either
implementation.  Every expected number is reproducible with pencil from
the derivation below.

Shared graph (same topology/mask as the aggregation fixture)
-------------------------------------------------------------
3 nodes, F=2 channels, 6 real + 2 masked edge lanes.
x = [[1,-1],[0,2],[2,0]];   edges (src→dst): (1→0) (2→0) (0→1) (2→1)
(1→1) (0→2), masked lanes (0→0) and (1→2) carry garbage attrs.
Degrees d=[2,3,1]; histogram [0,1,1,1] → avg_log_deg=(ln2+ln3+ln4)/3.

PNAConv layer
-------------
Weights: edge_encoder = I₂ (b=0); pre_nn kernel = three stacked I₂
blocks over [x_dst | x_src | e] (b=0)  ⇒  message m = x_dst + x_src + e.
Edge attrs are chosen so the messages equal EXACTLY the aggregation
fixture's messages ([1,2],[3,6] → node0; [0,1],[2,3],[4,5] → node1;
[7,−2] → node2), so the 3×24 agg block is the one already hand-derived
there (mean/min/max/std × id/amp/att, ε=1e-5 inside the std √).

post_nn input layout: [x(0:2) | mean(2:4) | min(4:6) | max(6:8) |
std(8:10) | amp·(mean,min,max,std)(10:18) | att·(...)(18:26)].
post_nn kernel: out₀ = h₀ + h₂ + h₉   (x₀ + mean₀ + std₁)
                out₁ = h₇ + h₂₅ + 0.25 (max₁ + att·std₁ + bias)
lin: kernel [[2,1],[0,−1]], bias [0.5,−1] ⇒
                y = [2u₀ + 0.5,  u₀ − u₁ − 1].

Per node (amp_d = ln(d+1)/avg, att_d = avg/ln(d+1)):
  node0 (d=2): u₀ = 1 + 2 + √(4+ε);  u₁ = 6 + att₂ₑ·√(4+ε) + 0.25
  node1 (d=3): u₀ = 0 + 2 + s, s=√(8/3+ε);  u₁ = 5 + att₃ₑ·s + 0.25
  node2 (d=1): u₀ = 2 + 7 + √ε;  u₁ = −2 + att₁ₑ·√ε + 0.25
(att₂ₑ = avg/ln3 etc. — subscript = in-degree.)

GINEConv layer
--------------
Weights: edge_lin = I₂ (b=0), eps=0 ⇒ msg = relu(x_src + attr); attrs
chosen so the PRE-relu messages are the same six vectors again; the
single message into node2, [7,−2], goes negative in ch1 ⇒ relu clips it
(proves relu sits on the message, not the sum).
  agg0 = [1,2]+[3,6] = [4,8];  agg1 = [0,1]+[2,3]+[4,5] = [6,9];
  agg2 = relu([7,−2]) = [7,0].
h = (1+0)·x + agg = [[5,7],[6,11],[9,0]].
nn_0: kernel [[1,0],[−1,1]], bias [−2,0] ⇒ v = [h₀−h₁−2, h₁];
  v = [[−4,7],[−7,11],[7,0]] → relu → [[0,7],[0,11],[7,0]]
  (relu clips ch0 on nodes 0/1 — proves the inter-layer relu).
nn_1: kernel [[1,2],[1,−1]], bias [0.5,−0.5] ⇒
  y = [v₀+v₁+0.5, 2v₀−v₁−0.5] = [[7.5,−7.5],[11.5,−11.5],[7.5,13.5]].

Writes tests/golden/conv_analytic.json.
"""
import json
import math
import os

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "tests", "golden", "conv_analytic.json")

EPS = 1e-5
avg = (math.log(2) + math.log(3) + math.log(4)) / 3.0

x = [[1.0, -1.0], [0.0, 2.0], [2.0, 0.0]]
src = [1, 2, 0, 2, 1, 0, 0, 1]
dst = [0, 0, 1, 1, 1, 2, 0, 2]
mask = [1, 1, 1, 1, 1, 1, 0, 0]

# target messages (same six vectors as the aggregation fixture)
m = [[1.0, 2.0], [3.0, 6.0], [0.0, 1.0], [2.0, 3.0], [4.0, 5.0],
     [7.0, -2.0]]

# PNA edge attrs: a_e = m_e − x_src − x_dst  (derived by hand above;
# recomputed here with scalar arithmetic as a transcription check)
pna_attr = [[m[e][c] - x[src[e]][c] - x[dst[e]][c] for c in range(2)]
            for e in range(6)] + [[999.0, -999.0], [123.0, 456.0]]

# GINE edge attrs: b_e = m_e − x_src
gine_attr = [[m[e][c] - x[src[e]][c] for c in range(2)]
             for e in range(6)] + [[999.0, -999.0], [123.0, 456.0]]


def pna_expected():
    out = []
    # (u0, u1) per the derivation; att_d = avg / ln(d+1)
    rows = [
        # node0: d=2
        (1.0 + 2.0 + math.sqrt(4.0 + EPS),
         6.0 + (avg / math.log(3)) * math.sqrt(4.0 + EPS) + 0.25),
        # node1: d=3
        (0.0 + 2.0 + math.sqrt(8.0 / 3.0 + EPS),
         5.0 + (avg / math.log(4)) * math.sqrt(8.0 / 3.0 + EPS) + 0.25),
        # node2: d=1
        (2.0 + 7.0 + math.sqrt(EPS),
         -2.0 + (avg / math.log(2)) * math.sqrt(EPS) + 0.25),
    ]
    for u0, u1 in rows:
        out.append([2.0 * u0 + 0.5, u0 - u1 - 1.0])
    return out


def gine_expected():
    # fully hand-derived above; transcribed
    return [[7.5, -7.5], [11.5, -11.5], [7.5, 13.5]]


def main():
    fix = {
        "source": "hand-derivation (scalar math module only), "
                  "tools/derive_conv_goldens.py",
        "x": x, "src": src, "dst": dst, "mask": mask,
        "avg_log_deg": avg,
        "pna": {"edge_attr": pna_attr, "expected": pna_expected()},
        "gine": {"edge_attr": gine_attr, "expected": gine_expected()},
    }
    with open(OUT, "w") as f:
        json.dump(fix, f, indent=1)
    print(f"wrote {OUT}")
    for k in ("pna", "gine"):
        print(k, fix[k]["expected"])


if __name__ == "__main__":
    main()
