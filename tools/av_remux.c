/* External tag-writer oracle: remux an MP3 elementary stream through
 * libavformat's mp3 muxer, which prepends a production Xing/Info
 * metadata frame (frame count, byte count, 100-entry TOC, "Lavf"
 * encoder string, tag CRC — ffmpeg libavformat/mp3enc.c).
 *
 * Usage: av_remux <in.mp3> <out.mp3>
 *
 * Test tooling only: pdmp3_tpu/metadata.py's Xing/LAME parser is
 * validated against this independent production writer (the reference
 * binary has no VBR-header support at all, and this image has no LAME
 * binary), in addition to the in-tree mp3gen writer.
 */
#include <stdio.h>
#include <stdlib.h>

#include <libavformat/avformat.h>
#include <libavutil/opt.h>

static void die(const char *msg) {
  fprintf(stderr, "av_remux: %s\n", msg);
  exit(1);
}

int main(int argc, char **argv) {
  if (argc != 3) die("usage: av_remux <in.mp3> <out.mp3>");

  AVFormatContext *in = NULL;
  if (avformat_open_input(&in, argv[1], NULL, NULL) < 0)
    die("open input");
  if (avformat_find_stream_info(in, NULL) < 0) die("stream info");
  int si = -1;
  for (unsigned i = 0; i < in->nb_streams; i++)
    if (in->streams[i]->codecpar->codec_type == AVMEDIA_TYPE_AUDIO) {
      si = (int)i;
      break;
    }
  if (si < 0) die("no audio stream");

  AVFormatContext *out = NULL;
  if (avformat_alloc_output_context2(&out, NULL, "mp3", argv[2]) < 0)
    die("alloc output");
  AVStream *ost = avformat_new_stream(out, NULL);
  if (!ost) die("new stream");
  if (avcodec_parameters_copy(ost->codecpar, in->streams[si]->codecpar) < 0)
    die("copy params");
  ost->time_base = in->streams[si]->time_base;
  /* no ID3v2 prologue: keep the Xing frame first in the output */
  av_opt_set_int(out->priv_data, "id3v2_version", 0, 0);
  av_opt_set_int(out->priv_data, "write_xing", 1, 0);

  if (avio_open(&out->pb, argv[2], AVIO_FLAG_WRITE) < 0) die("open output");
  if (avformat_write_header(out, NULL) < 0) die("write header");

  AVPacket *pkt = av_packet_alloc();
  while (av_read_frame(in, pkt) >= 0) {
    if (pkt->stream_index == si) {
      pkt->stream_index = 0;
      av_packet_rescale_ts(pkt, in->streams[si]->time_base, ost->time_base);
      if (av_interleaved_write_frame(out, pkt) < 0) die("write frame");
    }
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  if (av_write_trailer(out) < 0) die("trailer");
  avio_closep(&out->pb);
  avformat_free_context(out);
  avformat_close_input(&in);
  return 0;
}
