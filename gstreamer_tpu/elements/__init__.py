"""Element plugins — importing this package registers all factories
(the registry-scan equivalent of gstregistry.c)."""

from . import util_elements      # noqa: F401
from . import videotestsrc       # noqa: F401
from . import videoconvertscale  # noqa: F401
from . import audio_elements    # noqa: F401
from . import compositor        # noqa: F401
from . import videofilter       # noqa: F401
from . import videorate         # noqa: F401
from . import deinterlace      # noqa: F401
from . import file_elements     # noqa: F401
from . import audio_mix         # noqa: F401
from . import flow_elements     # noqa: F401
from . import wav_elements      # noqa: F401
from . import audiofx           # noqa: F401
from . import playback          # noqa: F401
from . import overlay           # noqa: F401
from . import smpte             # noqa: F401
from . import rawparse          # noqa: F401
from . import effectv           # noqa: F401
from . import interlace         # noqa: F401
from ..net import transport     # noqa: F401  (tcp/udp elements)
from . import subparse          # noqa: F401
from ..net import rtp            # noqa: F401  (rtp elements)
from ..net import rtp_payloaders # noqa: F401  (codec pay/depay, dtmf)
from ..net import rtp_payloaders2 # noqa: F401  (remaining pay/depay family)
from ..net import rtp_raw_audio  # noqa: F401  (L8/L24 + asteriskh263)
from ..net import rtp_hdrext     # noqa: F401  (RFC 8285 extensions)
from ..net import fec            # noqa: F401  (ST 2022-1 FEC)
from ..net import adaptive       # noqa: F401  (hlsdemux/dashdemux)
from ..net import sdp            # noqa: F401  (sdpdemux/rtpsrc/rtpsink)
from ..net import webrtc         # noqa: F401  (webrtcbin)
from . import bayer              # noqa: F401
from . import visualizers        # noqa: F401
from . import goom2k1            # noqa: F401
from . import jpegformat         # noqa: F401
from . import pcapparse          # noqa: F401
from . import dvd                # noqa: F401  (dvdlpcmdec/dvdsubdec/dvdspu)
from . import fieldanalysis      # noqa: F401
from . import shout2             # noqa: F401  (shout2send)
from . import dvbsub             # noqa: F401  (dvbsubenc/dvbsuboverlay)
from . import camerabin          # noqa: F401
from . import autoconvert        # noqa: F401
from . import playback_extra     # noqa: F401
from . import ipc_misc           # noqa: F401
from . import pitch              # noqa: F401
from . import good_extras        # noqa: F401
from . import dsd_elements       # noqa: F401
from . import bad_extras         # noqa: F401
from . import analytics_elements # noqa: F401
from . import closedcaption      # noqa: F401
from . import mxf                # noqa: F401
from . import timecode_misc      # noqa: F401
from . import midi_irtsp         # noqa: F401
from . import bad_bins           # noqa: F401
from . import asf                # noqa: F401
from . import smoke_codec_elements  # noqa: F401
from ..net import rtsp_server    # noqa: F401  (rtspsrc element)
from . import container_elements  # noqa: F401
from . import image_codecs       # noqa: F401
from . import audio_sinks        # noqa: F401
from . import debug_elements     # noqa: F401
from ..net import rtpmanager     # noqa: F401  (rtpsession/rtpbin)
from ..net import rist           # noqa: F401  (ristsink/ristsrc)
from ..net import srt            # noqa: F401  (srtsink/srtsrc)
from ..net import rtmp           # noqa: F401  (rtmp2src/rtmp2sink)
from ..net import srtp           # noqa: F401  (srtpenc/srtpdec)
from . import law_elements       # noqa: F401
from . import scaletempo         # noqa: F401
from . import replaygain         # noqa: F401
from . import cutter             # noqa: F401
from . import imagefreeze        # noqa: F401
from . import shapewipe          # noqa: F401
from . import isomp4             # noqa: F401
from . import textoverlay        # noqa: F401
from . import misc_elements      # noqa: F401
from . import splitmux           # noqa: F401
from . import multipart          # noqa: F401
from . import interleave         # noqa: F401
from . import removesilence      # noqa: F401
from . import monoscope          # noqa: F401
from . import flac_elements      # noqa: F401
from . import videosignal        # noqa: F401
from . import ogg                # noqa: F401
from . import xiph               # noqa: F401
from . import mpegaudio          # noqa: F401
from . import aacdec             # noqa: F401
from . import vpx_elements       # noqa: F401
from . import libav              # noqa: F401
from . import mpegps             # noqa: F401
from . import hlssink            # noqa: F401
from . import aes_misc           # noqa: F401
from . import transcode          # noqa: F401
from . import cc_sei             # noqa: F401
from . import tagmux             # noqa: F401
from . import flv                # noqa: F401
from . import adpcm_elements     # noqa: F401
from . import siren_elements     # noqa: F401
from . import lc3_elements       # noqa: F401  (LE-Audio LC3 codec)
from . import tensor_decoders2   # noqa: F401  (seg/obb/yolo26/face)
from . import faceoverlay        # noqa: F401
from . import chromaprint        # noqa: F401  (system-lib wrapper)
from . import audioparsers       # noqa: F401
from . import coloreffects       # noqa: F401
from . import gaudieffects       # noqa: F401
from . import geometrictransform # noqa: F401
from . import smooth_speed       # noqa: F401
from . import freeverb           # noqa: F401
from . import simple_formats     # noqa: F401
from . import gdp                # noqa: F401
from . import videofilters_bad   # noqa: F401
from . import mpegts             # noqa: F401
from . import xingmux            # noqa: F401
from . import inter_netsim       # noqa: F401
from . import flxdec             # noqa: F401
from . import dtmf_icy           # noqa: F401
from . import videoparsers       # noqa: F401
from . import bz2_elements      # noqa: F401  (bz2enc/bz2dec)
from . import codecalpha        # noqa: F401  (alpha decode bins)
from . import iqa               # noqa: F401
from . import realmedia          # noqa: F401  (rmdemux/rademux)
from . import ext_music         # noqa: F401  (gmedec/openmptdec)
from . import bs2b              # noqa: F401
from . import de265             # noqa: F401  (libde265dec)
from ..net import avtp          # noqa: F401  (IEEE 1722 AVB)
from .. import mse              # noqa: F401  (msesrc + MediaSource API)
from ..net import rfb           # noqa: F401  (rfbsrc VNC client)
from ..net import sctp          # noqa: F401  (sctpenc/sctpdec)
from ..net import fanout        # noqa: F401  (multiudpsink/dynudpsink/...)
from . import aliases           # noqa: F401  (alternate factory names)
from . import moreparsers       # noqa: F401  (h263/h266/vc1/dirac/j2k/ogg/tag parsers)
from ..net import dtls_elements # noqa: F401  (dtlsenc/dtlsdec/dtlssrtp*)
from . import subtitles_extra  # noqa: F401  (subtitleoverlay/ttml/ape/bpm)
from . import ipcpipeline      # noqa: F401  (cross-process pipeline split)
from . import gio_dv           # noqa: F401  (giostreamsrc/sink, dvdemux)
from ..net import websinks     # noqa: F401  (HTTP/FTP/SMTP client sinks)
from . import opencv_filters   # noqa: F401  (cv image-DSP family)
from . import opencv_analysis  # noqa: F401  (cv analysis/detection family)
from . import opencv_camera   # noqa: F401  (cv camera/cascade family)
from . import webrtcdsp       # noqa: F401  (voice processing DSP)
from . import assrender       # noqa: F401  (ASS/SSA styled subtitles)
from . import ogm             # noqa: F401  (OGM parsers, ogg-in-avi)
from ..net import rtp_tail    # noqa: F401  (remaining RTP pay/depay)
from . import pixbuf_overlay  # noqa: F401  (image/vector overlay family)
