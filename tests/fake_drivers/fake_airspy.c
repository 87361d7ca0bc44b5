/* Test double for the libairspy API surface the framework binds
 * (sdr_receiver_dvb_t2_tpu/io/vendor.py :: AirspyDevice).  Signatures
 * follow the vendored header (/root/reference/src/libairspy/src/airspy.h);
 * behavior: airspy_open_sn loads the interleaved int16 I/Q capture named
 * by $FAKE_AIRSPY_CAPTURE, airspy_start_rx spawns a pthread that pumps
 * 65536-sample INT16_IQ transfers through the registered callback
 * (lightly paced), modelling retunes (airspy_set_freq) as a baseband
 * shift.  When the capture is exhausted the pump exits and
 * airspy_is_streaming returns 0 — the stream-end signal.
 */
#include <math.h>
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

typedef struct {
    void *device;
    void *ctx;
    void *samples;
    int sample_count;
    uint64_t dropped_samples;
    int sample_type;
} airspy_transfer;

typedef int (*airspy_cb_fn)(airspy_transfer *);

static int device_token = 0;
static short *cap = NULL;
static long cap_len = 0;   /* complex samples */
static long pos = 0;
static double fs_hz = 10e6;
static uint32_t freq_hz = 0, freq0_hz = 0;
static int gain = -1;
static int sample_type = -1;
static int rf_bias = -1;
static volatile int streaming = 0;
static volatile int stop_req = 0;
static pthread_t pump_thread;
static airspy_cb_fn callback = NULL;
static void *cb_ctx = NULL;
static double phase = 0.0;

#define TRANSFER_SAMPLES 65536

int airspy_list_devices(uint64_t *serials, int count)
{
    if (count > 0) serials[0] = 0xFA4E5D11ULL;
    return 1;
}

int airspy_open_sn(void **dev, uint64_t serial)
{
    const char *path = getenv("FAKE_AIRSPY_CAPTURE");
    if (!path || serial != 0xFA4E5D11ULL) return -5; /* AIRSPY_ERROR_NOT_FOUND */
    FILE *f = fopen(path, "rb");
    if (!f) return -5;
    fseek(f, 0, SEEK_END);
    long bytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    free(cap);
    cap = (short *)malloc((size_t)bytes);
    if (fread(cap, 1, (size_t)bytes, f) != (size_t)bytes) {
        fclose(f);
        return -5;
    }
    fclose(f);
    cap_len = bytes / 4;
    pos = 0;
    phase = 0.0;
    freq_hz = freq0_hz = 0;
    *dev = &device_token;
    return 0;
}

int airspy_version_string_read(void *dev, char *version, uint8_t length)
{
    snprintf(version, length, "FAKE  AirSpy MINI v0.0.0");
    return 0;
}

int airspy_set_sample_type(void *dev, int t) { sample_type = t; return 0; }
int airspy_set_samplerate(void *dev, uint32_t r) { fs_hz = r; return 0; }
int airspy_set_rf_bias(void *dev, uint8_t v) { rf_bias = v; return 0; }
int airspy_set_sensitivity_gain(void *dev, uint8_t v) { gain = v; return 0; }

int airspy_set_freq(void *dev, uint32_t f)
{
    if (freq0_hz == 0) freq0_hz = f;  /* first tune = channel center */
    freq_hz = f;
    return 0;
}

static void *pump(void *arg)
{
    short *buf = (short *)malloc(2 * TRANSFER_SAMPLES * sizeof(short));
    while (!stop_req && pos < cap_len) {
        int n = TRANSFER_SAMPLES;
        if (cap_len - pos < n) n = (int)(cap_len - pos);
        double df = -((double)freq_hz - (double)freq0_hz);
        double w = 2.0 * M_PI * df / fs_hz;
        for (int k = 0; k < n; ++k) {
            float i = (float)cap[2 * pos];
            float q = (float)cap[2 * pos + 1];
            ++pos;
            float c = cosf((float)phase), s = sinf((float)phase);
            phase += w;
            if (phase > M_PI) phase -= 2.0 * M_PI;
            if (phase < -M_PI) phase += 2.0 * M_PI;
            float oi = i * c - q * s;
            float oq = i * s + q * c;
            if (oi > 32767.f) oi = 32767.f;
            if (oi < -32768.f) oi = -32768.f;
            if (oq > 32767.f) oq = 32767.f;
            if (oq < -32768.f) oq = -32768.f;
            buf[2 * k] = (short)lrintf(oi);
            buf[2 * k + 1] = (short)lrintf(oq);
        }
        airspy_transfer t;
        t.device = &device_token;
        t.ctx = cb_ctx;
        t.samples = buf;
        t.sample_count = n;
        t.dropped_samples = 0;
        t.sample_type = sample_type;
        if (callback) callback(&t);
        usleep(1000); /* ~2x real time pacing */
    }
    free(buf);
    streaming = 0;
    return NULL;
}

static int thread_started = 0;

int airspy_start_rx(void *dev, airspy_cb_fn cb, void *ctx)
{
    if (sample_type != 2) return -2; /* must be INT16_IQ */
    callback = cb;
    cb_ctx = ctx;
    stop_req = 0;
    streaming = 1;
    thread_started = 1;
    pthread_create(&pump_thread, NULL, pump, NULL);
    return 0;
}

int airspy_stop_rx(void *dev)
{
    if (thread_started) {
        stop_req = 1;
        pthread_join(pump_thread, NULL);
        thread_started = 0;
    }
    streaming = 0;
    return 0;
}

int airspy_is_streaming(void *dev) { return streaming; }

int airspy_close(void *dev)
{
    free(cap);
    cap = NULL;
    return 0;
}

/* --- state getters for test assertions --- */
uint32_t fake_airspy_get_freq(void) { return freq_hz; }
int fake_airspy_get_gain(void) { return gain; }
int fake_airspy_get_sample_type(void) { return sample_type; }
int fake_airspy_get_rf_bias(void) { return rf_bias; }
double fake_airspy_get_samplerate(void) { return fs_hz; }
