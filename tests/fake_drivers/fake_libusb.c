/* Fake libusb-1.0 (synchronous-API subset) for driving the native
 * PlutoSDR hi-speed driver (native/pluto/plutosdr_hi_speed_rx.c) in CI
 * with no USB hardware: enumerates ONE device with the Pluto VID/PID,
 * records every control transfer to the transcript file named by
 * FAKE_LIBUSB_TRANSCRIPT, and serves the bulk sample endpoint either
 * from the interleaved-int16 capture file FAKE_LIBUSB_CAPTURE (paced at
 * FAKE_LIBUSB_RATE_SPS; endpoint stalls after EOF) or, absent a capture,
 * from a deterministic ramp pattern.
 */
#include <stdarg.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include <unistd.h>

struct usb_descriptor {
    uint8_t bLength, bDescriptorType;
    uint16_t bcdUSB;
    uint8_t bDeviceClass, bDeviceSubClass, bDeviceProtocol,
        bMaxPacketSize0;
    uint16_t idVendor, idProduct, bcdDevice;
    uint8_t iManufacturer, iProduct, iSerialNumber, bNumConfigurations;
} __attribute__((packed));

static int the_device = 42;          /* opaque non-NULL tokens */
static int the_handle = 43;
static FILE *capture = NULL;
static long served = 0;
static double t0 = 0.0;
static double rate_sps = 0.0;

static void transcript(const char *fmt, ...) {
    const char *path = getenv("FAKE_LIBUSB_TRANSCRIPT");
    if (!path) return;
    FILE *f = fopen(path, "a");
    if (!f) return;
    va_list ap;
    va_start(ap, fmt);
    vfprintf(f, fmt, ap);
    va_end(ap);
    fputc('\n', f);
    fclose(f);
}

int libusb_init(void **ctx) { if (ctx) *ctx = (void *)&the_device; return 0; }
void libusb_exit(void *ctx) { (void)ctx; }

long libusb_get_device_list(void *ctx, void ***list) {
    (void)ctx;
    void **l = malloc(2 * sizeof(void *));
    l[0] = &the_device;
    l[1] = NULL;
    *list = l;
    return 1;
}

void libusb_free_device_list(void **list, int unref) {
    (void)unref;
    free(list);
}

int libusb_get_device_descriptor(void *dev, struct usb_descriptor *d) {
    if (dev != (void *)&the_device) return -1;
    memset(d, 0, sizeof(*d));
    d->bLength = 18;
    d->bDescriptorType = 1;
    d->idVendor = 0x0456;
    d->idProduct = 0xb673;
    return 0;
}

int libusb_open(void *dev, void **h) {
    if (dev != (void *)&the_device) return -1;
    *h = (void *)&the_handle;
    transcript("open");
    return 0;
}

void libusb_close(void *h) { (void)h; transcript("close"); }

int libusb_claim_interface(void *h, int iface) {
    (void)h;
    transcript("claim %d", iface);
    return 0;
}

int libusb_release_interface(void *h, int iface) {
    (void)h;
    transcript("release %d", iface);
    return 0;
}

int libusb_control_transfer(void *h, uint8_t reqtype, uint8_t req,
                            uint16_t val, uint16_t idx,
                            unsigned char *data, uint16_t len,
                            unsigned timeout) {
    (void)h; (void)val; (void)idx; (void)timeout;
    if (reqtype == 0xC1 && req == 0x20) {       /* GET_INFO: serial */
        const char *serial = "FAKEPLUTO-0001";
        int n = (int)strlen(serial);
        if (n > len) n = len;
        memcpy(data, serial, (size_t)n);
        transcript("ctrl_in 0x%02x", req);
        return n;
    }
    if (reqtype == 0x41) {
        char hex[64] = "";
        for (int i = 0; i < len && i < 16; ++i)
            snprintf(hex + 2 * i, sizeof(hex) - 2 * i, "%02x", data[i]);
        transcript("ctrl 0x%02x len=%u %s", req, (unsigned)len, hex);
        return len;
    }
    return -9;
}

static double now(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

int libusb_bulk_transfer(void *h, unsigned char ep, unsigned char *buf,
                         int length, int *actual, unsigned timeout) {
    (void)h; (void)timeout;
    if (ep != 0x81) return -9;
    /* reconfigure when the env CHANGES (tests in one process share these
     * statics through the dlopen cache); the pacing epoch resets only
     * then, so ramp mode doesn't reset t0 on every call */
    static char cfg[512] = {1};
    const char *p = getenv("FAKE_LIBUSB_CAPTURE");
    const char *r = getenv("FAKE_LIBUSB_RATE_SPS");
    char wantcfg[512];
    snprintf(wantcfg, sizeof(wantcfg), "%s|%s", p ? p : "", r ? r : "");
    if (strncmp(wantcfg, cfg, sizeof(cfg))) {
        snprintf(cfg, sizeof(cfg), "%s", wantcfg);
        if (capture) fclose(capture);
        capture = (p && *p) ? fopen(p, "rb") : NULL;
        rate_sps = r && *r ? atof(r) : 0.0;
        served = 0;
        t0 = now();
    }
    int want = length / 4;               /* IQ pairs */
    if (rate_sps > 0.0) {
        /* pace delivery at the configured device rate */
        double due = served / rate_sps;
        double dt = due - (now() - t0);
        if (dt > 0) usleep((useconds_t)(dt * 1e6));
    }
    int got;
    if (capture) {
        got = (int)fread(buf, 4, (size_t)want, capture);
        if (got <= 0) {                  /* EOF: stall like a dead EP */
            usleep(50 * 1000);
            *actual = 0;
            return -7;                   /* LIBUSB_ERROR_TIMEOUT */
        }
    } else {
        int16_t *s = (int16_t *)buf;
        for (int k = 0; k < want; ++k) { /* deterministic ramp pattern */
            long m = served + k;
            s[2 * k] = (int16_t)((m * 7) % 4001 - 2000);
            s[2 * k + 1] = (int16_t)((m * 13) % 4001 - 2000);
        }
        got = want;
    }
    served += got;
    *actual = got * 4;
    return 0;
}
