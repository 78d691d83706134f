"""Analytic FLOPs / HBM-traffic model for the EGT training step.

Used by bench.py to report MFU and memory-bandwidth utilization next to raw
graphs/s, and to derive a defensible baseline anchor for `vs_baseline`
(the reference repo publishes no throughput numbers — BASELINE.md).

Counting conventions:
- A matmul of (m, k) @ (k, n) counts 2*m*k*n FLOPs.
- The training step counts forward matmul FLOPs x3 (bwd does ~2x the fwd
  matmul work: one grad-vs-activations and one grad-vs-weights GEMM each).
- Traffic counts the quadratic (l^2-sized) tensors only — node-stream and
  weight traffic is two orders of magnitude smaller at these shapes.

v5e peak numbers: 197 TFLOP/s bf16, 394 TOPS int8, 819 GB/s HBM. The xplane
device plane of a trace on this part records peak_teraflops_per_second =
202.7 and peak_hbm_bw_gigabytes_per_second = 819.16, confirming the bf16
figure. (The r1/r2 benches used 394e12 as the bf16 peak — that is the INT8
number, so their reported MFUs understate by 2x.)
"""

from __future__ import annotations

from dataclasses import dataclass

V5E_PEAK_FLOPS_BF16 = 197e12
V5E_PEAK_FLOPS_F32 = 98.5e12
V5E_HBM_BYTES_PER_S = 819e9


@dataclass
class ShapeModel:
    b: int            # batch
    l: int            # padded nodes
    w: int            # model width
    ew: int           # edge width
    h: int            # heads
    height: int       # layers
    ffn_mult: float = 2.0

    # ------------------------------------------------------------------ FLOPs

    def fwd_flops_per_graph(self) -> float:
        l, w, ew, h = self.l, self.w, self.ew, self.h
        hn = int(self.ffn_mult * w)
        he = int(self.ffn_mult * ew)
        per_layer = 0.0
        # node stream: qkv, mha out, node FFN
        per_layer += 2 * l * w * 3 * w
        per_layer += 2 * l * w * w
        per_layer += 2 * (l * w * hn + l * hn * w)
        # attention: QK^T and AV over h heads of dim w/h
        per_layer += 2 * 2 * l * l * w
        # edge stream: gates + bias projections, dense_edge_r, edge FFN
        per_layer += 2 * 2 * l * l * ew * h
        per_layer += 2 * l * l * h * ew
        per_layer += 2 * (l * l * ew * he + l * l * he * ew)
        return per_layer * self.height

    def train_flops_per_graph(self) -> float:
        return 3.0 * self.fwd_flops_per_graph()

    # ---------------------------------------------------------------- traffic

    def min_train_hbm_bytes_per_graph(self, bytes_per_el: int = 2) -> float:
        """LOWER BOUND: per layer the edge tensor must be read and written
        once forward (e_in -> e_out) and its gradient read/written once
        backward, plus one h_hat-sized save for the bwd; everything else can
        in principle stay fused. Real XLA traffic is several x this."""
        l, ew, h = self.l, self.ew, self.h
        per_layer = (2 + 2) * l * l * ew * bytes_per_el \
            + l * l * h * bytes_per_el
        return per_layer * self.height

    # ------------------------------------------------------------------ rates

    def mfu(self, graphs_per_sec: float, dtype: str = "bfloat16") -> float:
        peak = (V5E_PEAK_FLOPS_BF16 if dtype == "bfloat16"
                else V5E_PEAK_FLOPS_F32)
        return graphs_per_sec * self.train_flops_per_graph() / peak

    def hbm_bw_util_lower_bound(self, graphs_per_sec: float) -> float:
        return (graphs_per_sec * self.min_train_hbm_bytes_per_graph()
                / V5E_HBM_BYTES_PER_S)

    def roofline_floor_ms_per_step(self, dtype: str = "bfloat16") -> float:
        """Per-step time floor on this chip: the slower of the MXU at peak on
        the analytic train FLOPs and the HBM at peak on the lower-bound
        traffic. Real steps sit above this by whatever traffic XLA adds over
        the bound (bench.py reports both so the gap is visible per shape)."""
        peak = (V5E_PEAK_FLOPS_BF16 if dtype == "bfloat16"
                else V5E_PEAK_FLOPS_F32)
        t_flops = self.b * self.train_flops_per_graph() / peak
        t_bytes = (self.b * self.min_train_hbm_bytes_per_graph()
                   / V5E_HBM_BYTES_PER_S)
        return 1e3 * max(t_flops, t_bytes)


def v100_tf2_baseline_graphs_per_sec(m: ShapeModel,
                                     attainment: float = 0.30) -> float:
    """Roofline-derived estimate of the TF2 reference on one V100 (fp32),
    the hardware class the reference targets (`environment.yml` pins TF 2.x
    CUDA builds; the paper's experiments are GPU-based).

    The reference's layer materializes the unfused quadratic chain
    (`egt_layers.py:57-143` + `graph_xformer_model_base.py:192-223,309-324`):
    gates, edge bias, logits, clipped logits, masked logits, softmax,
    sigmoid, their product, dropout mask+output, h_hat, dense_edge_r out,
    FFN hidden (ffn_mult x ew) and output, plus residuals — ~14 l^2-sized
    f32 tensor passes forward, roughly doubled by the backward tape reads
    and grad writes => ~30 equivalent ew-width passes per layer per step.

      traffic ~= 30 * l^2 * ew * 4B * height per graph
      V100 HBM2 = 900 GB/s => traffic ceiling
      fp32 compute ceiling = 15.7 TFLOP/s (never binding at these widths)

    Keras/tf.data pipelines on dynamic graph batches typically attain
    20-35% of the traffic roofline end to end (input pipeline, optimizer,
    kernel-launch gaps); this uses 30%. For the flagship shape this lands
    within ~2x of any plausible measurement — and since the reference
    publishes no numbers, the derivation (not the constant) is the anchor.
    """
    traffic = 30.0 * m.l * m.l * m.ew * 4 * m.height
    ceiling = 900e9 / traffic
    compute_ceiling = 15.7e12 / m.train_flops_per_graph()
    return attainment * min(ceiling, compute_ceiling)


# the plausible end-to-end attainment band for a Keras/tf.data pipeline
# against the traffic roofline (docstring above); bench.py publishes
# vs_baseline at the 30% center AND as a range over this band so the anchor's
# uncertainty is visible in the artifact rather than only in this docstring
BASELINE_ATTAINMENT_BAND = (0.20, 0.35)
