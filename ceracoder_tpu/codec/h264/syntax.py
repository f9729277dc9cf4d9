"""H.264 high-level syntax: NAL types, SPS, PPS, slice headers.

Implements the parameter-set and slice-header layers (spec 7.3.2, 7.3.3)
that the reference delegated to x264/GStreamer. Baseline-profile CAVLC
streams, frame_mbs_only, pic_order_cnt_type 2 (decode order == output
order — correct for all-intra and forward-predicted live streams, which
is ceracoder's domain).
"""

from __future__ import annotations

from dataclasses import dataclass

from ceracoder_tpu.codec.bitwriter import BitWriter, nal_unit

# NAL unit types (spec table 7-1)
NAL_SLICE = 1
NAL_IDR = 5
NAL_SEI = 6
NAL_SPS = 7
NAL_PPS = 8
NAL_AUD = 9

# Slice types (spec table 7-6); +5 variants mean "all slices in this
# picture have this type"
SLICE_P = 0
SLICE_I = 2
SLICE_P_ALL = 5
SLICE_I_ALL = 7


@dataclass
class SpsConfig:
    width: int
    height: int
    profile_idc: int = 66          # baseline
    level_idc: int = 40
    log2_max_frame_num: int = 8
    max_num_ref_frames: int = 1
    # VUI timing: fps = time_scale / (2 * num_units_in_tick)
    fps_num: int = 0               # 0 = no VUI timing
    fps_den: int = 1

    @property
    def mb_width(self) -> int:
        return (self.width + 15) // 16

    @property
    def mb_height(self) -> int:
        return (self.height + 15) // 16


def write_sps(cfg: SpsConfig) -> bytes:
    """Sequence parameter set RBSP (spec 7.3.2.1.1), wrapped as a NAL."""
    w = BitWriter()
    w.u(cfg.profile_idc, 8)
    # constraint_set0 (baseline) + set1 (main-compatible: no FMO/ASO used)
    w.flag(cfg.profile_idc == 66)
    w.flag(True)
    w.flag(False)
    w.flag(False)
    w.u(0, 4)                      # reserved_zero_4bits
    w.u(cfg.level_idc, 8)
    w.ue(0)                        # seq_parameter_set_id
    w.ue(cfg.log2_max_frame_num - 4)
    w.ue(2)                        # pic_order_cnt_type
    w.ue(cfg.max_num_ref_frames)
    w.flag(False)                  # gaps_in_frame_num_value_allowed
    w.ue(cfg.mb_width - 1)
    w.ue(cfg.mb_height - 1)
    w.flag(True)                   # frame_mbs_only_flag
    w.flag(True)                   # direct_8x8_inference_flag
    crop_r = cfg.mb_width * 16 - cfg.width
    crop_b = cfg.mb_height * 16 - cfg.height
    if crop_r or crop_b:
        w.flag(True)
        w.ue(0)                    # left
        w.ue(crop_r // 2)          # right, in CropUnitX=2 (4:2:0)
        w.ue(0)                    # top
        w.ue(crop_b // 2)          # bottom, CropUnitY=2 (frame_mbs_only)
    else:
        w.flag(False)
    if cfg.fps_num > 0:
        w.flag(True)               # vui_parameters_present
        w.flag(False)              # aspect_ratio_info_present
        w.flag(False)              # overscan_info_present
        w.flag(False)              # video_signal_type_present
        w.flag(False)              # chroma_loc_info_present
        w.flag(True)               # timing_info_present
        w.u(cfg.fps_den, 32)       # num_units_in_tick
        w.u(cfg.fps_num * 2, 32)   # time_scale (field rate)
        w.flag(True)               # fixed_frame_rate
        w.flag(False)              # nal_hrd_parameters_present
        w.flag(False)              # vcl_hrd_parameters_present
        w.flag(False)              # pic_struct_present
        w.flag(False)              # bitstream_restriction
    else:
        w.flag(False)
    w.rbsp_trailing_bits()
    return nal_unit(3, NAL_SPS, w.to_bytes())


@dataclass
class PpsConfig:
    pic_init_qp: int = 26
    chroma_qp_index_offset: int = 0
    deblocking_filter_control_present: bool = True
    cabac: bool = False


def write_pps(cfg: PpsConfig) -> bytes:
    """Picture parameter set RBSP (spec 7.3.2.2)."""
    w = BitWriter()
    w.ue(0)                        # pic_parameter_set_id
    w.ue(0)                        # seq_parameter_set_id
    w.flag(cfg.cabac)              # entropy_coding_mode_flag
    w.flag(False)                  # bottom_field_pic_order_in_frame_present
    w.ue(0)                        # num_slice_groups_minus1
    w.ue(0)                        # num_ref_idx_l0_default_active_minus1
    w.ue(0)                        # num_ref_idx_l1_default_active_minus1
    w.flag(False)                  # weighted_pred_flag
    w.u(0, 2)                      # weighted_bipred_idc
    w.se(cfg.pic_init_qp - 26)     # pic_init_qp_minus26
    w.se(0)                        # pic_init_qs_minus26
    w.se(cfg.chroma_qp_index_offset)
    w.flag(cfg.deblocking_filter_control_present)
    w.flag(False)                  # constrained_intra_pred_flag
    w.flag(False)                  # redundant_pic_cnt_present_flag
    w.rbsp_trailing_bits()
    return nal_unit(3, NAL_PPS, w.to_bytes())


@dataclass
class SliceConfig:
    first_mb: int = 0
    slice_type: int = SLICE_I_ALL
    frame_num: int = 0
    idr: bool = True
    idr_pic_id: int = 0
    qp: int = 26
    pic_init_qp: int = 26
    log2_max_frame_num: int = 8
    # disable_deblocking_filter_idc: 0 = on, 1 = off, 2 = on but not
    # across slice boundaries (the slice-row schedule's mode)
    deblock_idc: int = 1
    deblocking_filter_control_present: bool = True
    num_ref_idx_active_minus1: int = 0
    cabac: bool = False
    cabac_init_idc: int = 0


def write_slice_header(cfg: SliceConfig) -> BitWriter:
    """Slice header (spec 7.3.3) — returns an open BitWriter so the caller
    appends slice data before rbsp_trailing_bits()."""
    w = BitWriter()
    w.ue(cfg.first_mb)
    w.ue(cfg.slice_type)
    w.ue(0)                        # pic_parameter_set_id
    w.u(cfg.frame_num % (1 << cfg.log2_max_frame_num), cfg.log2_max_frame_num)
    if cfg.idr:
        w.ue(cfg.idr_pic_id)
    # pic_order_cnt_type == 2: no POC syntax
    is_p = cfg.slice_type % 5 == SLICE_P
    if is_p:
        w.flag(False)              # num_ref_idx_active_override_flag
        w.flag(False)              # ref_pic_list_modification_flag_l0
    if cfg.idr:
        w.flag(False)              # no_output_of_prior_pics_flag
        w.flag(False)              # long_term_reference_flag
    elif is_p:
        # dec_ref_pic_marking for reference P slices
        w.flag(False)              # adaptive_ref_pic_marking_mode_flag
    if cfg.cabac and is_p:
        w.ue(cfg.cabac_init_idc)
    w.se(cfg.qp - cfg.pic_init_qp)  # slice_qp_delta
    if cfg.deblocking_filter_control_present:
        w.ue(cfg.deblock_idc)
        if cfg.deblock_idc != 1:
            w.se(0)                # slice_alpha_c0_offset_div2
            w.se(0)                # slice_beta_offset_div2
    return w
