/* Test double for the libplutosdr hi-speed-rx API surface the framework
 * binds (sdr_receiver_dvb_t2_tpu/io/vendor.py :: PlutoDevice).  Signatures
 * follow the reference's custom driver header
 * (/root/reference/src/libplutosdr/plutosdr_hi_speed_rx.h); behavior:
 * plutosdr_open loads the interleaved int16 I/Q capture named by
 * $FAKE_PLUTOSDR_CAPTURE and reports len_out transfer sizing,
 * plutosdr_start_rx spawns a pthread that pumps PLANAR int16 transfers
 * (separate i_samples / q_samples arrays — the Pluto driver's layout,
 * unlike AirSpy's interleaved one) through the registered callback,
 * modelling retunes (plutosdr_set_rxlo) as a baseband shift.  When the
 * capture is exhausted the pump exits; a callback returning nonzero also
 * stops it (the reference stops the radio that way,
 * rx_plutosdr.cpp:225-240).  Config setters record their last values for
 * the test's assertions. */
#include <math.h>
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    unsigned char serial_number[2048];
    int serial_number_len;
    int samples_type;
    uint32_t len_out;
} plutosdr_info_t;

typedef struct {
    void *device;
    void *ctx;
    int16_t *i_samples;
    int16_t *q_samples;
    int sample_count;
} plutosdr_transfer;

typedef int (*plutosdr_cb_fn)(plutosdr_transfer *);

#define LEN_OUT 16384

static int device_token = 0;
static short *cap = NULL;
static long cap_len = 0;   /* complex samples */
static long pos = 0;
static double fs_hz = 0.0;
static uint64_t rxlo_hz = 0, rxlo0_hz = 0;
static uint32_t rfbw_hz = 0;
static uint32_t gain_mdb = 0;
static int gainctl_manual = 0;
static int chan_enabled[2] = {0, 0};
static int bufstream = 0;
static volatile int streaming = 0;
static volatile int stop_req = 0;
static pthread_t pump_thread;
static plutosdr_cb_fn callback = NULL;
static void *cb_ctx = NULL;
static double phase = 0.0;
static int closes = 0;

uint32_t plutosdr_get_device_count(void) { return 1; }

int plutosdr_open(void **dev, uint8_t idx, plutosdr_info_t *info)
{
    const char *path = getenv("FAKE_PLUTOSDR_CAPTURE");
    if (!path || idx != 0) return -4; /* PLUTOSDR_ERROR_NO_DEVICE */
    FILE *f = fopen(path, "rb");
    if (!f) return -4;
    fseek(f, 0, SEEK_END);
    long bytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    free(cap);
    cap = (short *)malloc((size_t)bytes);
    if (fread(cap, 1, (size_t)bytes, f) != (size_t)bytes) {
        fclose(f);
        return -4;
    }
    fclose(f);
    cap_len = bytes / 4;
    pos = 0;
    phase = 0.0;
    rxlo_hz = rxlo0_hz = 0;
    if (info) {
        const char *ser = "FAKEPLUTO001";
        info->serial_number_len = (int)strlen(ser);
        memcpy(info->serial_number, ser, strlen(ser));
        info->len_out = LEN_OUT;
    }
    *dev = &device_token;
    return 0;
}

int plutosdr_set_rfbw(void *dev, uint32_t hz) { rfbw_hz = hz; return 0; }
int plutosdr_set_sample_rate(void *dev, uint32_t hz)
{
    fs_hz = (double)hz;
    return 0;
}
int plutosdr_set_rxlo(void *dev, uint64_t hz)
{
    if (!rxlo0_hz) rxlo0_hz = hz;
    rxlo_hz = hz;
    return 0;
}
int plutosdr_set_gainctl_manual(void *dev) { gainctl_manual = 1; return 0; }
int plutosdr_set_gain_mdb(void *dev, uint32_t mdb)
{
    gain_mdb = mdb;
    return 0;
}
int plutosdr_buffer_channel_enable(void *dev, uint32_t ch, uint32_t en)
{
    if (ch < 2) chan_enabled[ch] = (int)en;
    return 0;
}
int plutosdr_bufstream_enable(void *dev, uint32_t en)
{
    bufstream = (int)en;
    return 0;
}
void plutosdr_set_fir_coeff(void *dev, char *buf) { (void)buf; }

static double now_s(void)
{
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

static void *pump(void *arg)
{
    static int16_t ibuf[LEN_OUT], qbuf[LEN_OUT];
    /* pace delivery to the configured sample rate: real hardware cannot
     * deliver faster than fs, and retune-flush semantics depend on the
     * backlog being bounded by real time.  $FAKE_PLUTOSDR_RATE_SPS
     * overrides the pace so tests on a slow CI host can model the
     * hardware-true relationship consumer >= producer (a CI consumer runs
     * far below real time; an unpaced pump would finish the capture
     * before the first retune and the retune flush would drop it all). */
    double pace = fs_hz > 0 ? fs_hz : 9.2e6;
    const char *p_env = getenv("FAKE_PLUTOSDR_RATE_SPS");
    if (p_env && atof(p_env) > 0) pace = atof(p_env);
    double t0 = now_s();
    while (!stop_req && pos < cap_len) {
        double due = t0 + (double)pos / pace;
        double late = now_s() - due;
        if (late < 0) {
            struct timespec w = {0, (long)(-late * 1e9)};
            nanosleep(&w, NULL);
        }
        long n = cap_len - pos < LEN_OUT ? cap_len - pos : LEN_OUT;
        /* retune model: a moved LO shifts the delivered baseband by
         * -(rxlo - rxlo0) */
        double dw = -2.0 * M_PI * ((double)rxlo_hz - (double)rxlo0_hz)
                    / fs_hz;
        for (long k = 0; k < n; ++k) {
            double c = cos(phase), s = sin(phase);
            double xi = cap[2 * (pos + k)], xq = cap[2 * (pos + k) + 1];
            double yi = xi * c - xq * s, yq = xi * s + xq * c;
            if (yi > 32767) yi = 32767; if (yi < -32768) yi = -32768;
            if (yq > 32767) yq = 32767; if (yq < -32768) yq = -32768;
            ibuf[k] = (int16_t)lrint(yi);
            qbuf[k] = (int16_t)lrint(yq);
            phase += dw;
        }
        if (n < LEN_OUT) {
            memset(ibuf + n, 0, (LEN_OUT - n) * sizeof(int16_t));
            memset(qbuf + n, 0, (LEN_OUT - n) * sizeof(int16_t));
        }
        pos += n;
        plutosdr_transfer t;
        t.device = &device_token;
        t.ctx = cb_ctx;
        t.i_samples = ibuf;
        t.q_samples = qbuf;
        t.sample_count = LEN_OUT;
        if (callback && callback(&t) != 0) break;
    }
    streaming = 0;
    return NULL;
}

int plutosdr_start_rx(void *dev, plutosdr_cb_fn cb, void *ctx)
{
    if (streaming) return -6; /* BUSY */
    if (!bufstream || !chan_enabled[0] || !chan_enabled[1])
        return -1000;          /* OTHER: init sequence not completed */
    callback = cb;
    cb_ctx = ctx;
    stop_req = 0;
    streaming = 1;
    if (pthread_create(&pump_thread, NULL, pump, NULL) != 0) {
        streaming = 0;
        return -1001; /* THREAD */
    }
    return 0;
}

int plutosdr_stop_rx(void *dev)
{
    if (streaming || stop_req == 0) {
        stop_req = 1;
        if (callback) pthread_join(pump_thread, NULL);
    }
    callback = NULL;
    return 0;
}

int plutosdr_close(void *dev)
{
    plutosdr_stop_rx(dev);
    ++closes;
    return 0;
}

int plutosdr_reboot(void *dev) { return 0; }

/* --- test inspection hooks (not part of the real API) --- */
double fake_pluto_get_rxlo(void) { return (double)rxlo_hz; }
uint32_t fake_pluto_get_gain_mdb(void) { return gain_mdb; }
uint32_t fake_pluto_get_rfbw(void) { return rfbw_hz; }
double fake_pluto_get_samplerate(void) { return fs_hz; }
int fake_pluto_get_gainctl_manual(void) { return gainctl_manual; }
int fake_pluto_get_bufstream(void) { return bufstream; }
int fake_pluto_get_closes(void) { return closes; }
int fake_pluto_is_streaming(void) { return streaming; }
